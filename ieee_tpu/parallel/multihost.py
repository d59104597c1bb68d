"""Multi-host (multi-process) SPMD utilities — DCN scale-out.

The reference's one strategy is single-process ``nn.DataParallel``
(SURVEY §2.8); the single-process mesh path here already covers one host's
chips. This module adds the multi-HOST story the TPU-native way:

* one ``jax.distributed.initialize`` call per process (``init_multihost``),
* every process runs the SAME SPMD program over the global mesh,
* each process feeds only its slice of every global batch
  (``ProcessShardSampler``) and the engine assembles the global array with
  ``jax.make_array_from_process_local_data`` (engine.py ``_put_batch``).

Contract: every process constructs identically-seeded samplers (the same
``data.seed``), so the underlying global index sequence is identical
everywhere and the per-batch slices are disjoint and complete. Test
loaders stay UNsharded — evaluation is replicated per process (standard
practice; the eval program is identical so every process computes the
same metrics).

Single-process behavior is unchanged: ``process_count() == 1`` short-
circuits everything.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

__all__ = ["init_multihost", "ProcessShardSampler"]


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
):
    """Initialize JAX's distributed runtime when multi-process coordinates
    are given (or discoverable from the TPU environment); no-op otherwise.

    Returns ``(process_index, process_count)``. Call once, before any
    other JAX API, on every process. On Cloud TPU pods, calling with no
    arguments lets JAX auto-discover the coordinator.
    """
    import jax

    if coordinator_address or (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    else:
        # no explicit coordinates: let JAX auto-discover them (Cloud TPU
        # pod metadata / SLURM / env). Outside a recognized multi-host
        # environment this raises — fall back to single-process, but say
        # so LOUDLY: the caller explicitly asked for multi-host, and a
        # silent fallback would run N independent duplicated single-process
        # jobs (each on the full global batch) with only a 'process 0/1'
        # print as evidence.
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as e:  # noqa: BLE001 — re-surfaced via warning
            import warnings

            warnings.warn(
                "init_multihost: jax.distributed.initialize() auto-discovery"
                f" failed ({type(e).__name__}: {e}); falling back to"
                " SINGLE-process mode. If this is a pod launch, every worker"
                " is now training independently on the full global batch —"
                " pass explicit coordinator_address/num_processes/process_id.",
                RuntimeWarning, stacklevel=2,
            )
    return jax.process_index(), jax.process_count()


class ProcessShardSampler:
    """Wraps any sampler so each process yields its contiguous slice of
    every GLOBAL batch.

    The base sampler's index stream is buffered into global batches of
    ``global_batch_size``; process ``p`` of ``P`` keeps rows
    ``[p*B/P, (p+1)*B/P)`` of each one. The per-process loader then runs
    with ``batch_size = B/P`` and the slices reassemble into the intended
    global batch on device (process order == axis-0 order, matching
    ``make_array_from_process_local_data``). A trailing partial global
    batch is dropped — multi-host training implies drop-last semantics
    (a short batch cannot be split evenly across processes).

    The slice is K-instance aligned for P x K identity batches as long as
    ``B/P`` is a multiple of ``num_instances`` — each process then holds
    whole pid groups and the (P, K) loss contract survives sharding.
    """

    def __init__(self, base, global_batch_size: int, process_index: int,
                 process_count: int):
        if global_batch_size % process_count:
            raise ValueError(
                f"global batch {global_batch_size} must divide evenly over "
                f"{process_count} processes")
        if not 0 <= process_index < process_count:
            raise ValueError(
                f"process_index {process_index} out of range "
                f"[0, {process_count})")
        self.base = base
        self.global_batch_size = int(global_batch_size)
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        self.local_batch_size = self.global_batch_size // self.process_count

    def __iter__(self) -> Iterator[int]:
        buf: List[int] = []
        lo = self.process_index * self.local_batch_size
        hi = lo + self.local_batch_size
        for idx in iter(self.base):
            buf.append(idx)
            if len(buf) == self.global_batch_size:
                yield from buf[lo:hi]
                buf = []
        # trailing partial global batch dropped (see class docstring)

    def __len__(self) -> int:
        return (len(self.base) // self.global_batch_size) \
            * self.local_batch_size
