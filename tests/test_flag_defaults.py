"""Pin the module-level A/B flags to their measured-verdict defaults.

The kernels keep every experimental flavor A/B-able behind module flags
(probe scripts flip them in-process).  Round 4 shipped a commit whose
message said "indirect flavor kept off" while the diff left
TRAIN_INDIRECT = True — a measured-loser default (~+1.3 ms/step on the
worst-case bench) that nothing caught until a full bench re-run.  This
test makes the documented verdicts (RESULTS.md "Negative results",
ROADMAP.md) executable: if an A/B experiment changes a default on
purpose, update the verdict docs AND this table in the same commit.
"""
from curve_gaussian_tpu.ops import binning as B
from curve_gaussian_tpu.ops import rasterize_pallas as RP


def test_rasterize_flag_defaults_match_measured_verdicts():
    # winners (RESULTS.md round-4 attribution + round-5 A/B)
    assert RP.PAIRED_BLEND is True
    assert RP.USE_MOMENT_BWD is True
    assert RP._BWD_GROUP == 32
    assert RP._FWD_CHUNK == 64
    assert RP.FWD_CONSERVE is True         # free ops + 2 registers (r5)
    assert RP.BWD_SCR_BF16 is True         # 5.16 -> 5.01 ms/step (r5)
    assert B.SORT_PACKED is True           # 5.16 -> 5.00 ms/step (r5)
    # measured losers, kept A/B-able but OFF by default
    assert RP.TRAIN_INDIRECT is False      # 5.5 -> 6.8 ms/step
    assert RP.BWD_SCR_REDUCED is False     # 5.55 -> 5.86 ms/step
    assert RP.USE_BASIS_BWD is False       # 9.67 vs 7.36 ms in-step
    assert RP.FAST_EXP_CHEAP is False      # ~1% win, ~4% alpha error
