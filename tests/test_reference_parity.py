"""Parity tests that run the REFERENCE's own code (loaded by path from
/root/reference) against ieee_tpu — the strongest anchor available: no
re-implementation of the oracle, the reference module itself is executed.

Pure-numpy reference modules (utils/rerank.py, metrics/rank.py) import as-is
modulo dead imports that modern numpy removed; those are stubbed in
sys.modules before loading.
"""

from __future__ import annotations

import importlib.util
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not osp.isdir(REF_ROOT), reason="reference checkout not present"
)


def _load_reference_module(relpath: str, name: str):
    """Import a reference module by file path, stubbing modules the
    reference's (stale) imports need but modern numpy no longer ships."""
    if "numpy.lib.function_base" not in sys.modules:
        stub = types.ModuleType("numpy.lib.function_base")
        stub._parse_input_dimensions = None  # imported, never used
        sys.modules["numpy.lib.function_base"] = stub
    path = osp.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _clustered_dist(num_pids=10, per_pid=5, dim=24, seed=0):
    rng = np.random.default_rng(seed)
    centers = 3.0 * rng.standard_normal((num_pids, dim))
    feats = np.concatenate(
        [centers[p] + rng.standard_normal((per_pid, dim))
         for p in range(num_pids)]
    ).astype(np.float32)
    pids = np.repeat(np.arange(num_pids), per_pid)
    mask = np.arange(len(feats)) % 3 == 0
    q, g = feats[mask], feats[~mask]
    q_pids, g_pids = pids[mask], pids[~mask]

    def sqdist(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1).astype(np.float32)

    return q, g, q_pids, g_pids, sqdist


def test_rerank_bitwise_matches_reference():
    ref = _load_reference_module("torchreid/utils/rerank.py", "ref_rerank")
    from ieee_tpu.ops.rerank import re_ranking

    q, g, _, _, sqdist = _clustered_dist(seed=3)
    d_qg, d_qq, d_gg = sqdist(q, g), sqdist(q, q), sqdist(g, g)

    ours = re_ranking(d_qg, d_qq, d_gg, k1=10, k2=4, lambda_value=0.3)
    theirs = ref.re_ranking(d_qg, d_qq, d_gg, k1=10, k2=4, lambda_value=0.3)
    # f32 ulp-level agreement (summation-order noise only)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)


def test_rerank_matches_reference_default_params():
    ref = _load_reference_module("torchreid/utils/rerank.py", "ref_rerank2")
    from ieee_tpu.ops.rerank import re_ranking

    q, g, _, _, sqdist = _clustered_dist(num_pids=14, per_pid=6, seed=7)
    d_qg, d_qq, d_gg = sqdist(q, g), sqdist(q, q), sqdist(g, g)
    np.testing.assert_allclose(
        re_ranking(d_qg, d_qq, d_gg),
        ref.re_ranking(d_qg, d_qq, d_gg),
        rtol=1e-4, atol=1e-6,
    )


@pytest.fixture(scope="module")
def ref_rank():
    return _load_reference_module("torchreid/metrics/rank.py", "ref_rank")


def test_eval_market1501_matches_reference(ref_rank):
    from ieee_tpu.ops.ranking import eval_market1501_numpy

    rng = np.random.default_rng(11)
    q, g, q_pids, g_pids, sqdist = _clustered_dist(seed=11)
    q_camids = rng.integers(0, 4, len(q)).astype(np.int64)
    g_camids = rng.integers(0, 4, len(g)).astype(np.int64)
    d = sqdist(q, g)

    cmc_ref, map_ref = ref_rank.eval_market1501(
        d, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    cmc, mAP = eval_market1501_numpy(
        d, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    np.testing.assert_allclose(cmc, cmc_ref, atol=1e-6)
    assert abs(mAP - map_ref) < 1e-6


def test_eval_market1501_device_matches_reference(ref_rank):
    from ieee_tpu.ops.ranking import eval_market1501_device

    rng = np.random.default_rng(5)
    q, g, q_pids, g_pids, sqdist = _clustered_dist(num_pids=8, seed=5)
    q_camids = rng.integers(0, 3, len(q)).astype(np.int64)
    g_camids = rng.integers(0, 3, len(g)).astype(np.int64)
    d = sqdist(q, g)

    cmc_ref, map_ref = ref_rank.eval_market1501(
        d, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    cmc, mAP = eval_market1501_device(
        d, q_pids, g_pids, q_camids, g_camids, max_rank=10
    )
    np.testing.assert_allclose(np.asarray(cmc), cmc_ref, atol=1e-5)
    assert abs(float(mAP) - map_ref) < 1e-5


def test_eval_regdb_matches_reference(ref_rank, capsys):
    from ieee_tpu.ops.ranking import eval_regdb

    q, g, q_pids, g_pids, sqdist = _clustered_dist(num_pids=6, seed=9)
    d = sqdist(q, g)
    cmc_ref, map_ref = ref_rank.eval_regdb(d, q_pids, g_pids, None, None,
                                           max_rank=10)
    capsys.readouterr()  # the reference prints per-query debug lines
    cmc, mAP = eval_regdb(d, q_pids, g_pids, max_rank=10)
    np.testing.assert_allclose(cmc, cmc_ref, atol=1e-6)
    assert abs(mAP - map_ref) < 1e-6
