"""Serialization tests: the reference-compatible text protocol + npz."""

import os

import numpy as np
import pytest

import spmm_tpu as st
from spmm_tpu.sparse import io


@pytest.fixture
def mat():
    return st.random(24, 30, density=0.2, format="csr", random_state=0)


def test_text_roundtrip(tmp_path, mat):
    prefix = str(tmp_path / "m")
    io.save_csr_txt(prefix, mat)
    for suffix in ("_indptr.txt", "_indices.txt", "_data.txt",
                   "_shape.txt"):
        assert os.path.exists(prefix + suffix)
    back = io.load_csr_txt(prefix)
    assert back.shape == mat.shape
    np.testing.assert_array_equal(np.asarray(back.indptr),
                                  np.asarray(mat.indptr))
    np.testing.assert_array_equal(np.asarray(back.indices),
                                  np.asarray(mat.indices))
    # %.9g round-trips float32 exactly
    np.testing.assert_array_equal(
        np.asarray(back.data).view(np.uint32),
        np.asarray(mat.data).view(np.uint32))


def test_csrs_txt_equal(tmp_path, mat):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    io.save_csr_txt(p1, mat)
    io.save_csr_txt(p2, mat)
    assert io.csrs_txt_equal(p1, p2)
    other = mat._with_data(mat.data * 2)
    io.save_csr_txt(p2, other)
    assert not io.csrs_txt_equal(p1, p2)


def test_npz_roundtrip(tmp_path, mat):
    path = str(tmp_path / "m.npz")
    io.save_npz(path, mat)
    back = io.load_npz(path)
    assert back.shape == mat.shape
    np.testing.assert_array_equal(
        np.asarray(back.data).view(np.uint32),
        np.asarray(mat.data).view(np.uint32))


def test_text_format_matches_reference_protocol(tmp_path, mat):
    """Ints as %d, floats as %.9g, one value per line — the format the
    native cross-check binary reads (gen_and_save_alg1_txt.py:8-15)."""
    prefix = str(tmp_path / "m")
    io.save_csr_txt(prefix, mat)
    lines = open(prefix + "_indptr.txt").read().splitlines()
    assert len(lines) == mat.shape[0] + 1
    assert all(l.lstrip("-").isdigit() for l in lines)
    dlines = open(prefix + "_data.txt").read().splitlines()
    assert len(dlines) == mat.nnz


def test_spmv_plan_roundtrip(tmp_path):
    """Routed/binned serving plans persist (analysis is seconds at
    scale — serving setups build once and reload)."""
    import jax.numpy as jnp
    import spmm_tpu as st
    from spmm_tpu.ops.kernels.spmv_routed import (spmv_routed,
                                                  spmv_routed_plan)
    from spmm_tpu.sparse.io import load_spmv_plan, save_spmv_plan

    a = st.random(200, 180, 0.05, format="csr", random_state=4)
    plan = spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), 200, 180)
    p = str(tmp_path / "plan.npz")
    save_spmv_plan(p, ("routed", plan))
    tag, plan2 = load_spmv_plan(p)
    assert tag == "routed"
    x = jnp.asarray(np.random.default_rng(0).standard_normal(180)
                    .astype(np.float32))
    y1 = np.asarray(spmv_routed(x, plan, interpret=True))
    y2 = np.asarray(spmv_routed(x, plan2, interpret=True))
    assert np.array_equal(y1.view(np.uint32), y2.view(np.uint32))


def test_spmv_plan_version_rejected(tmp_path):
    """A plan saved under a different format version must be rejected —
    the packed seg-word encoding changed in round 3, and a stale plan
    would decode silently wrong (ADVICE r3 medium)."""
    from spmm_tpu.ops.kernels.spmv_routed import spmv_routed_plan
    from spmm_tpu.sparse.io import load_spmv_plan, save_spmv_plan

    a = st.random(64, 64, 0.1, format="csr", random_state=1)
    plan = spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), 64, 64)
    p = str(tmp_path / "plan.npz")
    save_spmv_plan(p, ("routed", plan))
    # forge an old/absent version field
    with np.load(p) as f:
        stale = {k: f[k] for k in f.files if k != "plan_format_version"}
    np.savez(p, **stale)
    with pytest.raises(ValueError, match="format version"):
        load_spmv_plan(p)
    np.savez(p, plan_format_version=np.int64(999), **stale)
    with pytest.raises(ValueError, match="format version"):
        load_spmv_plan(p)
