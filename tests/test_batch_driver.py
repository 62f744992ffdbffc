"""Batch-driver logic: skip-if-done resume and in-process failure isolation
(scripts/run_batch_abc.py; reference scripts/run_batch_ABC.py semantics)."""
import importlib
import json
import os
import sys


def _load_driver():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    return importlib.import_module("run_batch_abc")


def test_in_process_skip_and_failure_isolation(tmp_path, monkeypatch):
    drv = _load_driver()
    data = tmp_path / "data"
    out = tmp_path / "out"
    for s in ("a", "b", "c"):
        (data / s).mkdir(parents=True)
    # scan 'a' is already done -> must be skipped
    (out / "a").mkdir(parents=True)
    (out / "a" / "parametric_edges.json").write_text(json.dumps({}))

    calls = []

    class FakeTrain:
        @staticmethod
        def main():
            scan = sys.argv[sys.argv.index("-s") + 1]
            calls.append(os.path.basename(scan))
            if scan.endswith("b"):
                raise RuntimeError("boom")  # must not kill the batch

    monkeypatch.setitem(sys.modules, "train", FakeTrain)
    monkeypatch.setattr(
        sys, "argv",
        ["run_batch_abc.py", "--data-root", str(data), "--output-root",
         str(out), "--in-process"],
    )
    drv.main()
    # 'a' skipped, 'b' failed but 'c' still ran
    assert calls == ["b", "c"]
    assert sys.argv[0] == "run_batch_abc.py"  # argv restored
