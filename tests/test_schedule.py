"""Surgery schedule cadence vs the reference train.py:183-211 conditions."""
from curve_gaussian_tpu.config import OptimizationConfig
from curve_gaussian_tpu.models.surgery import schedule_fires


def reference_fires(it, opt):
    """Literal transcription of the reference's schedule conditions."""
    fires = False
    if it < opt.densify_until_iter:
        if it > opt.densify_from_iter and it % opt.densification_interval == 0:
            fires = True
    if it == opt.densify_until_iter:
        fires = True
    if it % 1000 == 500 and it > opt.densify_until_iter:
        fires = True
    if it % 1000 == 0 and it > 3000 and it != opt.iterations:
        fires = True
    if (it % 1000 == 0 and it > opt.densify_until_iter) or it == opt.iterations:
        fires = True
    return fires


def test_default_schedule_matches_reference():
    opt = OptimizationConfig()
    fired = [i for i in range(1, opt.iterations + 1) if schedule_fires(i, opt)]
    expect = [i for i in range(1, opt.iterations + 1) if reference_fires(i, opt)]
    assert fired == expect
    # spot checks of the known cadence
    assert 2000 in fired and 4000 in fired and 6000 in fired  # densify
    assert 7000 in fired  # prune + fix_opacity
    assert 7500 in fired and 8500 in fired  # only_prune + mask_trim
    assert 8000 in fired and 9000 in fired  # split + merge
    assert 10000 in fired  # final fit/merge
    assert 1500 not in fired and 6999 not in fired


def test_compressed_schedule_still_fires():
    import dataclasses

    opt = dataclasses.replace(
        OptimizationConfig(),
        iterations=100,
        densify_from_iter=5,
        densify_until_iter=70,
        densification_interval=20,
    )
    fired = [i for i in range(1, 101) if schedule_fires(i, opt)]
    assert 20 in fired and 40 in fired and 60 in fired
    assert 70 in fired and 100 in fired
