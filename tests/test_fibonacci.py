import numpy as np

from zebrapose_tpu.tools.fibonacci_code import (
    anneal_code_assignment,
    fibonacci_sphere,
    locality_cost,
)


def test_fibonacci_sphere_uniform_unit():
    pts = fibonacci_sphere(500)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0,
                               atol=1e-9)
    # quasi-uniform: octant counts roughly balanced
    octant = (pts[:, 0] > 0).astype(int) * 4 + \
        (pts[:, 1] > 0).astype(int) * 2 + (pts[:, 2] > 0).astype(int)
    counts = np.bincount(octant, minlength=8)
    assert counts.min() > 40 and counts.max() < 90


def test_annealing_improves_locality():
    pts = fibonacci_sphere(128)
    codes, c0, c1 = anneal_code_assignment(pts, n_bits=8,
                                           iterations=4000, seed=1)
    assert codes.shape == (128, 8)
    # all codes distinct
    ids = codes @ (2 ** np.arange(7, -1, -1))
    assert len(set(ids.tolist())) == 128
    assert c1 < c0  # annealing reduced neighbor Hamming distance
