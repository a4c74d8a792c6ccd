import os

import numpy as np
import scipy.sparse as sp

from mlamg_tpu.data.petsc_io import (
    read_petsc_mat,
    read_petsc_vec,
    write_petsc_mat,
    write_petsc_vec,
)


def test_mat_roundtrip(tmp_path, rng):
    A = sp.random(30, 20, density=0.2, format="csr", random_state=rng)
    p = os.path.join(tmp_path, "a.petsc")
    write_petsc_mat(p, A)
    B = read_petsc_mat(p)
    assert abs(A - B).max() < 1e-15


def test_vec_roundtrip(tmp_path, rng):
    v = rng.randn(40)
    p = os.path.join(tmp_path, "v.petsc")
    write_petsc_vec(p, v)
    np.testing.assert_allclose(read_petsc_vec(p), v)


def test_bad_magic(tmp_path):
    p = os.path.join(tmp_path, "junk")
    with open(p, "wb") as f:
        f.write(b"\x00" * 32)
    try:
        read_petsc_mat(p)
        assert False
    except ValueError as e:
        assert "not a PETSc" in str(e)
