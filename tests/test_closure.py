"""hoisted_jit: closed-over tables must become runtime arguments, not
HLO literals (the axon tunnel rejects >~100 MB compile bodies, 413)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.utils.closure import hoisted_jit


def test_hoists_large_consts_out_of_hlo():
    big = np.arange(1 << 20, dtype=np.float32)  # 4 MB
    x = jnp.ones((1 << 20,), jnp.float32)
    hf = hoisted_jit(lambda v: (v * big).sum(), x)
    assert hf.n_hoisted == 1
    assert float(hf(x)) == pytest.approx(float((x * big).sum()))
    txt = hf.jitted.lower(hf.consts, x).as_text()
    assert len(txt) < 1 << 16  # literal would be ~8 MB of text


def test_small_consts_stay_embedded():
    small = np.arange(8, dtype=np.float32)
    x = jnp.ones((8,), jnp.float32)
    hf = hoisted_jit(lambda v: v + small, x)
    assert hf.n_hoisted == 0
    np.testing.assert_allclose(np.asarray(hf(x)), 1.0 + small)


def test_pytree_args_and_multiple_outputs():
    big = np.arange(1 << 16, dtype=np.float64)
    x = jnp.ones((1 << 16,), jnp.float64)
    hg = hoisted_jit(
        lambda a, b: (a["u"] * big + b, (a["u"] - b).sum()),
        {"u": x}, x,
    )
    y1, y2 = hg({"u": x}, x)
    np.testing.assert_allclose(np.asarray(y1), big + 1.0)
    assert float(y2) == 0.0


def test_general_operator_hlo_stays_small():
    """The fused general apply's chain tables must not appear as HLO
    literals under hoisted_jit (interpret-mode pallas on CPU)."""
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, pack_cell_values,
    )
    from wave_fenics_tpu.ops.pallas_general import make_general_apply

    p = 2
    hm = box_mesh((4, 3, 3), (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hm, p)
    tb = build_batch_tables(
        np.asarray(dofs.dofmap, np.int64), dofs.ndofs, tile_h=128
    )
    assert len(tb.spill_cells) == 0
    nd = (p + 1) ** 3
    detJw = np.ones((1, hm.ncells, nd))
    geo = pack_cell_values(tb, detJw, np.float64)
    apply = make_general_apply(tb, geo, "mass", dtype=jnp.float64,
                               interpret=True)
    x = jnp.ones((dofs.ndofs,), jnp.float64)
    hf = hoisted_jit(apply, x, min_bytes=1 << 10)
    assert hf.n_hoisted >= 3  # chain tables + geo at least
    y_ref = apply(x)
    np.testing.assert_allclose(np.asarray(hf(x)), np.asarray(y_ref),
                               rtol=1e-13)
