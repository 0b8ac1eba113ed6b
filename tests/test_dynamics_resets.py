"""Densification dynamics under the REAL schedule shape: opacity resets on.

test_dynamics_parity.py pins cross-config parity with resets disabled; this
suite runs the schedule the reference actually trains with (VERDICT r2
missing #1 / next #4): several opacity-reset cycles
(``opacity_reset_interval`` << iterations, ref densification.py:68-76 +
gaussian_model.py:555-561), size-pruning active past the first reset
(ref gaussian_model.py:1028-1042), and enough iterations that the isect
entry-buffer shrink/re-grow transient fires (post-reset opacities of 0.01
collapse the opacity-aware cull rects severalfold — ROUND2_NOTES "output-
invariant tight culling" — so capacity telemetry must shrink and then
re-grow the buffer as opacities recover).

The capacity floor is lowered so the transient is observable at CPU-test
scale (at the production floor of 2^14 entries a 64x48 scene never leaves
the floor).
"""

import numpy as np
import jax
import pytest

from grendel_tpu.config import TrainConfig
from grendel_tpu.engine.trainer import Trainer
from grendel_tpu.testing import SyntheticScene

_ITERS = 360   # last reset at 240 -> 120 iters of opacity recovery pre-eval


@pytest.fixture(scope="module")
def scene():
    return SyntheticScene(n_cams=8, n_test=2, width=64, height=48,
                          n_gaussians=300, n_init_points=250, sh_degree=1,
                          seed=11)


def _cfg(path, bsz):
    cfg = TrainConfig()
    cfg.model.sh_degree = 1
    cfg.model.model_path = str(path)
    o = cfg.opt
    o.iterations = _ITERS
    o.densify_from_iter = 40
    o.densification_interval = 40
    o.densify_until_iter = 240
    o.opacity_reset_interval = 120        # resets at 120, 240
    o.densify_grad_threshold = 2e-4
    cfg.dist.bsz = bsz
    cfg.test_iterations = []
    cfg.save_iterations = []
    cfg.checkpoint_iterations = []
    cfg.log_interval = 1                  # telemetry ticks every step
    return cfg.finalize()


@pytest.fixture(scope="module")
def runs(scene, tmp_path_factory, eight_devices):
    out = {}
    for name, devs, bsz in [("1dev_b1", eight_devices[:1], 1),
                            ("8dev_b1", eight_devices, 1),
                            ("8dev_b4", eight_devices, 4)]:
        tmp = tmp_path_factory.mktemp(name)
        tr = Trainer(_cfg(tmp, bsz), scene, devices=list(devs))
        tr.isect_cap_floor = 2048
        tr.isect_shrink_gap = 1.4   # observable transient at toy scale
        tr.train()
        r = tr.eval_psnr(scene.test_cameras, sh_degree=1)
        out[name] = {"psnr": r["psnr"], "hist": tr.densify_history,
                     "events": tr.capacity_events,
                     "resets": tr.opacity_reset_iters}
    return out


def test_reset_schedule_fires(runs):
    """Both reset cycles fire at the reference crossings (pre-increment
    sched_it; the bsz=4 run fires within its batch granularity)."""
    assert runs["1dev_b1"]["resets"] == [120, 240]
    assert runs["8dev_b1"]["resets"] == [120, 240]
    r4 = runs["8dev_b4"]["resets"]
    assert len(r4) == 2
    for ref, got in zip([120, 240], r4):
        assert ref - 4 < got <= ref + 4, r4


def test_size_prune_active_after_first_reset(runs):
    """Past the first reset the densify pass prunes (low-opacity cull after
    the reset + size pruning, ref densify_and_prune)."""
    for name, r in runs.items():
        post = [h for h in r["hist"] if h["iter"] > 120]
        assert post, r["hist"]
        assert any(h["prune"] > 0 for h in post), (name, r["hist"])


def test_isect_capacity_transient_fires(runs):
    """The post-reset cull collapse shrinks the entry buffer and the
    recovery re-grows it — the transient the telemetry guard protects."""
    for name, r in runs.items():
        kinds = [k for k, _ in r["events"]]
        assert "isect_grow" in kinds, (name, r["events"])
    # the single-device run ticks telemetry every step: both directions
    kinds1 = [k for k, _ in runs["1dev_b1"]["events"]]
    assert "isect_shrink" in kinds1, runs["1dev_b1"]["events"]


def test_psnr_parity_with_resets(runs):
    """Looser band than the no-reset suite (0.32 dB measured there): the
    eval lands mid-recovery after the second reset, where training is
    chaotic at toy scale. A seed study (round 3, seeds 11/12/13) shows the
    1dev-vs-8dev gap is NOISE, not systematic: seed 11 has 1dev ahead by
    ~1.6 dB, seed 12 has 8dev ahead by ~1.0 dB, seed 13 is a tie — so the
    band is set at ~2.5x the observed cross-seed spread. A real routing /
    grad-scale break diverges by many dB, not fractions."""
    ps = {k: v["psnr"] for k, v in runs.items()}
    spread = max(ps.values()) - min(ps.values())
    assert spread < 2.75, f"PSNR spread across configs too large: {ps}"
    assert min(ps.values()) > 15.0, ps


def test_n3dgs_trajectory_band_with_resets(runs):
    """Alive counts stay in a band across configs at each densify step —
    including the post-reset prune dips."""
    trajs = {k: [h["alive"] for h in v["hist"]] for k, v in runs.items()}
    n_events = {k: len(t) for k, t in trajs.items()}
    assert len(set(n_events.values())) == 1, n_events
    for i in range(next(iter(n_events.values()))):
        counts = [t[i] for t in trajs.values()]
        assert max(counts) / max(min(counts), 1) < 1.6, (i, trajs)
    assert all(t[-1] > 300 for t in trajs.values()), trajs
