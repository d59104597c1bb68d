import numpy as np
import pytest

from ieee_tpu.ops import (
    accuracy,
    compute_distance_matrix,
    cosine_distance,
    euclidean_squared_distance,
)
from ieee_tpu.ops.ranking import (
    eval_cuhk03_numpy,
    eval_market1501_device,
    eval_market1501_numpy,
)


def _rand_eval_problem(num_q=32, num_g=300, num_pids=20, num_cams=5, seed=0):
    rng = np.random.default_rng(seed)
    distmat = rng.random((num_q, num_g)).astype(np.float32)
    q_pids = rng.integers(0, num_pids, num_q)
    g_pids = rng.integers(0, num_pids, num_g)
    q_camids = rng.integers(0, num_cams, num_q)
    g_camids = rng.integers(0, num_cams, num_g)
    return distmat, q_pids, g_pids, q_camids, g_camids


def test_euclidean_squared_matches_numpy():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((17, 64)).astype(np.float32)
    b = rng.standard_normal((23, 64)).astype(np.float32)
    got = np.asarray(euclidean_squared_distance(a, b))
    want = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_cosine_matches_numpy():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((11, 32)).astype(np.float32)
    b = rng.standard_normal((13, 32)).astype(np.float32)
    got = np.asarray(cosine_distance(a, b))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    want = 1 - an @ bn.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_compute_distance_matrix_dispatch():
    a = np.ones((3, 8), np.float32)
    b = np.zeros((4, 8), np.float32)
    d = np.asarray(compute_distance_matrix(a, b, "euclidean"))
    np.testing.assert_allclose(d, np.full((3, 4), 8.0), rtol=1e-5)
    with pytest.raises(ValueError):
        compute_distance_matrix(a[..., None], b)
    with pytest.raises(ValueError):
        compute_distance_matrix(a, b, "manhattan")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_rank_matches_numpy_oracle(seed):
    prob = _rand_eval_problem(seed=seed)
    cmc_np, map_np = eval_market1501_numpy(*prob, max_rank=20)
    cmc_dev, map_dev = eval_market1501_device(*prob, max_rank=20)
    np.testing.assert_allclose(cmc_dev, cmc_np, rtol=1e-5, atol=1e-5)
    assert abs(map_dev - map_np) < 1e-5


def test_rank_perfect_retrieval():
    # gallery = 2 copies of each query pid, distances make same-pid closest
    num_q, num_pids = 10, 10
    q_pids = np.arange(num_q)
    g_pids = np.repeat(np.arange(num_pids), 2)
    q_camids = np.zeros(num_q, int)
    g_camids = np.ones(len(g_pids), int)
    distmat = np.abs(q_pids[:, None] - g_pids[None, :]).astype(np.float32)
    cmc, mAP = eval_market1501_device(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=5
    )
    assert cmc[0] == pytest.approx(1.0)
    assert mAP == pytest.approx(1.0)


def test_rank_same_cam_filtering():
    # the only same-pid gallery shares the query camera -> query dropped
    q_pids, q_camids = np.array([0, 1]), np.array([0, 0])
    g_pids, g_camids = np.array([0, 1, 2]), np.array([0, 1, 1])
    distmat = np.array([[0.1, 0.5, 0.9], [0.5, 0.1, 0.9]], np.float32)
    cmc, mAP = eval_market1501_numpy(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=3
    )
    cmc_d, mAP_d = eval_market1501_device(
        distmat, q_pids, g_pids, q_camids, g_camids, max_rank=3
    )
    # only query 1 is valid; its match ranks first among kept
    assert cmc[0] == pytest.approx(1.0)
    np.testing.assert_allclose(cmc_d, cmc, atol=1e-6)
    assert mAP_d == pytest.approx(mAP, abs=1e-6)


def test_cuhk03_metric_runs():
    prob = _rand_eval_problem(num_q=12, num_g=80, num_pids=8, seed=3)
    cmc, mAP = eval_cuhk03_numpy(*prob, max_rank=10, rng=0)
    assert cmc.shape == (10,)
    assert 0.0 <= mAP <= 1.0
    assert np.all(np.diff(cmc) >= -1e-6)  # CMC is non-decreasing


def test_accuracy():
    logits = np.array(
        [[10.0, 1.0, 0.0], [0.0, 5.0, 1.0], [1.0, 0.0, 3.0], [9.0, 2.0, 1.0]]
    )
    target = np.array([0, 1, 0, 1])
    top1, top2 = accuracy(logits, target, topk=(1, 2))
    assert top1 == pytest.approx(50.0)
    assert top2 == pytest.approx(100.0)
    # list input takes first element
    assert accuracy([logits], target)[0] == pytest.approx(50.0)


def test_native_cpp_rank_matches_numpy():
    prob = _rand_eval_problem(seed=7)
    cmc_np, map_np = eval_market1501_numpy(*prob, max_rank=20)
    from ieee_tpu.native.ranking import eval_market1501_native

    cmc_c, map_c = eval_market1501_native(*prob, max_rank=20)
    np.testing.assert_allclose(cmc_c, cmc_np, rtol=1e-5, atol=1e-5)
    assert abs(map_c - map_np) < 1e-5


def test_sharded_distmat_matches_single_device():
    """Query rows sharded over an 8-device mesh (shard_map) must reproduce
    the single-device distmat exactly, including non-divisible row counts."""
    import jax

    from ieee_tpu.ops.distance import (
        compute_distance_matrix,
        compute_distance_matrix_sharded,
    )
    from ieee_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = make_mesh([8], ("data",))
    rng = np.random.default_rng(0)
    q = rng.standard_normal((19, 32)).astype(np.float32)  # 19 % 8 != 0
    g = rng.standard_normal((23, 32)).astype(np.float32)
    for metric in ("euclidean", "cosine"):
        ref = np.asarray(compute_distance_matrix(q, g, metric))
        out = np.asarray(compute_distance_matrix_sharded(q, g, mesh, metric))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
