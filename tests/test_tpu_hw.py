"""Hardware-only tests: Pallas-vs-JAX parity on a real TPU chip.

These are SKIPPED under the CPU-forced conftest; run them on a chip with

    JAX_PLATFORMS='' python -m pytest tests/test_tpu_hw.py -q --no-header \
        -p no:cacheprovider -o addopts=''

(i.e. without the conftest platform override — simplest is a separate
process: `python tests/test_tpu_hw.py`). Tolerances document the expected
cross-backend variation on hardware (Mosaic vs XLA exp ulps + a few
include-threshold flips); exact agreement is asserted in interpret mode by
tests/test_rasterize_pallas.py.
"""

import numpy as np
import pytest


def _on_tpu():
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU chip")


def _scene_and_fns(w=256, h=192, n=5000, mpt=512):
    import jax
    import jax.numpy as jnp
    from grendel_tpu.ops.isect import isect_tiles
    from grendel_tpu.ops.rasterize_jax import rasterize_slots
    from grendel_tpu.ops.rasterize_pallas import rasterize_slots_pl
    from grendel_tpu.testing import make_test_camera, project_test_scene

    TILE = 16
    cam = make_test_camera(width=w, height=h)
    _, splats = project_test_scene(jax.random.PRNGKey(0), n, cam)
    tx, ty = -(-w // TILE), -(-h // TILE)
    isect = jax.jit(lambda m, r, d: isect_tiles(
        m, r, d, TILE, TILE, tx, ty, capacity=1 << 17))(
        splats.means2d, splats.radii, splats.depths)
    t_ids = jnp.arange(tx * ty, dtype=jnp.int32)
    px0 = (t_ids % tx) * TILE
    py0 = (t_ids // tx) * TILE

    def mk(f, *extra):
        def loss(m2, c, cl, o):
            cc, tt = f(m2, c, cl, o, isect.gauss_ids, isect.tile_offsets,
                       px0, py0, TILE, TILE, mpt, *extra)
            return jnp.sum(cc * cc) + 0.7 * jnp.sum(tt * tt), (cc, tt)

        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3),
                                          has_aux=True))

    args = (splats.means2d, splats.conics, splats.colors, splats.opacities)
    return mk(rasterize_slots_pl), mk(rasterize_slots, 64), args


def test_pallas_matches_jax_on_hardware():
    f_pl, f_jx, args = _scene_and_fns()
    (vp, (cp, tp)), gp = f_pl(*args)
    (vj, (cj, tj)), gj = f_jx(*args)
    np.testing.assert_allclose(float(vp), float(vj), rtol=1e-4)
    # forward image: widespread ulp-level differences, small absolute bound
    assert np.abs(np.asarray(cp) - np.asarray(cj)).max() < 5e-3
    assert np.abs(np.asarray(tp) - np.asarray(tj)).max() < 2e-3
    # gradients: tight medians, bounded tails (include-flip outliers)
    for name, a, b in zip(("m2d", "con", "col", "op"), gp, gj):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(b).max() + 1e-8
        d = np.abs(a - b) / s
        print(f"{name}: med={np.median(d):.2e} "
              f"q999={np.quantile(d, 0.999):.2e} max={d.max():.2e}")
        assert np.median(d) < 1e-4, name
        assert np.quantile(d, 0.999) < 2e-2, name
        assert d.max() < 1e-1, name


def test_mxu_bwd_reduce_gradient_error_band():
    """Regression guard for the OPT-IN fast bf16 MXU backward route
    (GRENDEL_FAST_BWD_REDUCE=1): its gradient rounding vs the exact-VPU
    default must stay inside the band the round-3 training-quality A/B
    characterized (~0.5-0.7 dB final PSNR cost at these magnitudes — the
    reason the default is the exact mode, ROUND3_NOTES.md)."""
    import grendel_tpu.ops.rasterize_pallas as rp

    old = rp._MXU_BWD_REDUCE
    try:
        rp._MXU_BWD_REDUCE = True
        f_mxu, _, args = _scene_and_fns()
        (v_m, _), g_m = f_mxu(*args)
        rp._MXU_BWD_REDUCE = False
        f_exact, _, _ = _scene_and_fns()
        (v_e, _), g_e = f_exact(*args)
    finally:
        rp._MXU_BWD_REDUCE = old
    np.testing.assert_allclose(float(v_m), float(v_e), rtol=1e-5)
    for name, a, b in zip(("m2d", "con", "col", "op"), g_m, g_e):
        a, b = np.asarray(a), np.asarray(b)
        s = np.abs(b).max() + 1e-8
        d = np.abs(a - b) / s
        print(f"mxu-vs-exact {name}: med={np.median(d):.2e} "
              f"q999={np.quantile(d, 0.999):.2e} max={d.max():.2e}")
        # single-pass bf16 band (measured: m2d med ~1.5e-4, max ~4.5e-3);
        # this magnitude of rounding is what cost ~0.5-0.7 dB in the A/B
        assert np.median(d) < 6e-4, name
        assert np.quantile(d, 0.999) < 1e-2, name
        assert d.max() < 3e-2, name


if __name__ == "__main__":
    # allow `python tests/test_tpu_hw.py` on a chip without pytest config
    import sys

    sys.path.insert(0, ".")
    if not _on_tpu():
        print("SKIP: no TPU")
    else:
        test_pallas_matches_jax_on_hardware()
        print("PASS: pallas matches jax on hardware")
        test_mxu_bwd_reduce_gradient_error_band()
        print("PASS: MXU bwd-reduce gradient error inside band")


def test_pallas_scan_matches_cumsum_on_hardware():
    """The compiled (Mosaic) multi-channel prefix scan is bit-identical to
    jnp.cumsum at production entry-axis sizes (the isect expansion's
    segment broadcasts run through it on TPU — ops/scan_pallas.py)."""
    import jax.numpy as jnp
    from grendel_tpu.ops.scan_pallas import cumsum_i32_multi

    rng = np.random.default_rng(7)
    m = 1_048_576 + 384          # non-block-multiple production size
    xs = [jnp.asarray(rng.integers(-5000, 5000, m, dtype=np.int32))
          for _ in range(4)]
    outs = cumsum_i32_multi(xs)          # compiled, not interpret
    for x, o in zip(xs, outs):
        np.testing.assert_array_equal(np.asarray(o),
                                      np.asarray(jnp.cumsum(x)))
