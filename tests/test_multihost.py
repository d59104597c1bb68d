"""Multi-host utilities (parallel/multihost.py): per-process sampler
sharding is pure logic, testable single-process."""

import numpy as np
import pytest

from ieee_tpu.parallel import ProcessShardSampler, init_multihost


class _Seq:
    def __init__(self, n):
        self.n = n

    def __iter__(self):
        return iter(range(self.n))

    def __len__(self):
        return self.n


def test_shards_partition_every_global_batch():
    base = _Seq(20)  # global batches of 8: [0-7], [8-15]; tail 16-19 dropped
    shards = [list(ProcessShardSampler(base, 8, p, 4)) for p in range(4)]
    assert shards[0] == [0, 1, 8, 9]
    assert shards[3] == [6, 7, 14, 15]
    # per global batch: union of slices == the batch, disjoint, ordered
    for b in range(2):
        got = sorted(sum((s[b * 2:(b + 1) * 2] for s in shards), []))
        assert got == list(range(b * 8, b * 8 + 8))
    assert all(len(s) == len(ProcessShardSampler(base, 8, 0, 4)) == 4
               for s in shards)


def test_identity_sampler_shards_keep_pid_groups():
    """Identically-seeded base samplers across 'processes' produce one
    global sequence; each process slice holds whole K-instance pid groups
    (the (P, K) loss contract survives sharding)."""
    from ieee_tpu.data.sampler import RandomIdentitySampler

    data = [(f"im{i}.jpg", i % 8, i % 3) for i in range(64)]

    def shard(pidx):
        base = RandomIdentitySampler(data, batch_size=16, num_instances=4,
                                     seed=7)
        return list(ProcessShardSampler(base, 16, pidx, 2))

    s0, s1 = shard(0), shard(1)
    base_all = list(RandomIdentitySampler(data, batch_size=16,
                                          num_instances=4, seed=7))
    nb = len(base_all) // 16
    for b in range(nb):
        want = base_all[b * 16:(b + 1) * 16]
        assert s0[b * 8:(b + 1) * 8] == want[:8]
        assert s1[b * 8:(b + 1) * 8] == want[8:]
        # local slice = whole pid groups of K=4
        pids = [data[i][1] for i in s0[b * 8:(b + 1) * 8]]
        for g in range(2):
            assert len(set(pids[g * 4:(g + 1) * 4])) == 1


def test_shard_sampler_validation():
    with pytest.raises(ValueError, match="divide"):
        ProcessShardSampler(_Seq(8), 10, 0, 4)
    with pytest.raises(ValueError, match="out of range"):
        ProcessShardSampler(_Seq(8), 8, 4, 4)


def test_init_multihost_single_process_noop():
    pi, pc = init_multihost()
    assert (pi, pc) == (0, 1)
