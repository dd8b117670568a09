"""Phase controller + LR schedule unit tests (reference parity:
utils/train_util.py, utils/general_utils.py:49-82)."""

import numpy as np

from gsvc_tpu.config import OptimizationConfig
from gsvc_tpu.models.gaussians import GenerateMode
from gsvc_tpu.train.controller import TrainingController
from gsvc_tpu.train.schedules import build_schedules, expon_lr


def mk_opt(**kw):
    base = dict(full_precision_training_total=10, quantized_training_total=5,
                entropy_constrained_train_total=20,
                ste_entropy_constrained_train_total=5,
                start_stat=2, update_from=4, update_interval=3,
                update_until=25, pause_densification=3)
    base.update(kw)
    return OptimizationConfig(**base)


def test_phase_sequence():
    c = TrainingController(mk_opt())
    seen = []
    for it in range(1, 41):
        c.current_iteration = it
        seen.append(c.render_mode)
    assert seen[0] == GenerateMode.FULL_PRECISION
    assert seen[9] == GenerateMode.FULL_PRECISION
    assert seen[10] == GenerateMode.QUANTIZED_NOISE
    assert seen[14] == GenerateMode.QUANTIZED_NOISE
    assert seen[15] == GenerateMode.ENTROPY
    assert seen[34] == GenerateMode.ENTROPY
    assert seen[35] == GenerateMode.STE_ENTROPY
    assert seen[39] == GenerateMode.STE_ENTROPY
    assert c.entropy_constrained


def test_densification_pause_after_quantization_start():
    c = TrainingController(mk_opt())
    # stats run in (start_stat, update_until) except the pause window
    c.current_iteration = 5
    assert c.gaussian_statis
    c.current_iteration = 11  # inside [10, 10+3) pause
    assert not c.gaussian_statis
    c.current_iteration = 14
    assert c.gaussian_statis
    c.current_iteration = 26  # past update_until
    assert not c.gaussian_statis


def test_adjust_anchor_gating():
    c = TrainingController(mk_opt())
    c.current_iteration = 6  # >update_from, %3==0
    assert c.gaussian_adjust_anchor
    c.current_iteration = 7
    assert not c.gaussian_adjust_anchor
    c.current_iteration = 12  # inside pause [10, 13]
    assert not c.gaussian_adjust_anchor
    c.current_iteration = 27  # past update_until
    assert not c.gaussian_adjust_anchor


def test_expon_lr_endpoints():
    f = expon_lr(1e-2, 1e-4, max_steps=100)
    assert abs(f(0) - 1e-2) < 1e-9
    assert abs(f(100) - 1e-4) < 1e-9
    assert f(50) == np.exp((np.log(1e-2) + np.log(1e-4)) / 2)
    # zero-lr group disables
    assert expon_lr(0.0, 0.0)(10) == 0.0


def test_schedule_groups_complete():
    s = build_schedules(OptimizationConfig())
    assert set(s) == {"anchor", "offset", "mask", "feat", "opacity",
                      "scaling", "rotation", "mlp_opacity", "mlp_cov",
                      "mlp_color", "hash", "mlp_deform", "mlp_enet"}
    assert s["rotation"](5) == 0.0  # frozen
    assert s["offset"](0) > s["offset"](40_000)
