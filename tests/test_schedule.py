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


def test_interval_config_fields_are_honored():
    """prune_trim/split/merge cadences are CONFIG, not literals — sweeping
    them must shift the event set (round-1 verdict flagged this bug class
    for conn_from_iter)."""
    import dataclasses

    opt = dataclasses.replace(
        OptimizationConfig(),
        prune_trim_interval=500,  # fires at %500 == 250 past densify_until
        split_interval=2000,
        split_from_iter=4000,
        merge_interval=2000,
    )
    fired = {i for i in range(1, opt.iterations + 1) if schedule_fires(i, opt)}
    expect = (
        {2000, 4000, 6000}  # densify (interval 2000 in (500, 7000))
        | {7000}  # densify_until prune + fix_opacity
        | {7250, 7750, 8250, 8750, 9250, 9750}  # prune/trim half-phase of 500
        | {6000, 8000}  # split at 2000 cadence past 4000 (not 10000)
        | {8000, 10000}  # merge at 2000 cadence past 7000, final iter
    )
    assert fired == expect


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
