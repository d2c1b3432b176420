"""Multi-host (multi-process) execution over DCN.

The single-process modules shard a ``jax.sharding.Mesh`` over the chips one
process can see. Production pods run ONE PROCESS PER HOST: this module
wires those processes into one logical mesh (``jax.distributed`` — the
coordination service plus the Gloo/DCN collectives XLA inserts for
cross-host edges), feeds each process its local slice of the global batch
(``jax.make_array_from_process_local_data``), and leaves every existing
train/infer step unchanged: the mesh axes and shardings are identical,
only the device list is global.

The reference hardware has no multi-board story — its "comm backend" is a
single AXI bus (SURVEY §2.5) — so this is pure TPU-native scale-out: data
parallelism rides ICI inside a slice and DCN across slices, and the SPMD
program every process runs is byte-identical.

Tested for real (not mocked) by ``tests/test_multihost.py``: two OS
processes x 4 virtual CPU devices each form an 8-device global mesh, run
the production ``make_train_step`` on per-process batch halves, and the
resulting params match the single-process full-batch step at f32 ulp.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MultiHostEngine",
    "init_multihost",
    "is_primary",
    "global_batches",
    "global_image_batch",
    "local_rows",
    "allgather_to_host",
]


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   local_device_ids=None) -> None:
    """Join this process to the job's global JAX runtime.

    ``coordinator`` is ``host:port`` of process 0. Must run before any
    other JAX call (device backends initialise lazily on first use). A
    single-process job (``num_processes == 1``) is a no-op so CLI paths
    can call this unconditionally.
    """
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def is_primary() -> bool:
    """True on the process that should own host-side singletons (stdout
    reporting, .npz snapshots, bundle export)."""
    return jax.process_index() == 0


def global_batches(mesh: Mesh, host_batches, num_classes_dtype=np.int32):
    """Lift per-process host batches into GLOBAL arrays on ``mesh``.

    Every process iterates the same deterministic batch stream (same seed
    -> same permutation) and contributes the contiguous slice of each
    global batch that belongs to its devices; process-local shards never
    leave their host — ``make_array_from_process_local_data`` only stamps
    the global shape/sharding around them. Feeding the result to a jitted
    step makes XLA insert the cross-host gradient psum over DCN.

    A production loader can equivalently stream ONLY its slice from disk;
    this helper takes the full batch so single-host datasets (train/data.py
    sources) scale out without a sharded-dataset format.
    """
    n_proc = jax.process_count()
    pid = jax.process_index()
    n_dev = mesh.devices.size
    sh = NamedSharding(mesh, P("data"))
    for bi, bl in host_batches:
        if len(bi) % n_dev:
            # no silent row drop: the data axis spans every device of
            # every host, so the global batch must tile exactly
            raise ValueError(
                f"global batch {len(bi)} must divide by the mesh's device "
                f"count {n_dev} ({n_proc} processes)"
            )
        k = len(bi) // n_proc
        sl = slice(pid * k, (pid + 1) * k)
        yield (
            jax.make_array_from_process_local_data(sh, np.ascontiguousarray(bi[sl])),
            jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(bl[sl].astype(num_classes_dtype))
            ),
        )


def global_image_batch(mesh: Mesh, images: np.ndarray):
    """Lift this process's image slice to one global inference batch,
    sharded over EVERY mesh axis flattened — the pure-batch layout the
    production megakernel path uses (``mesh.shard_batch(all_axes=True)``),
    which a data-only mesh reduces to plain dp. The global batch is the
    concatenation of the per-process slices in process order."""
    sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(images)
    )


def local_rows(global_out) -> np.ndarray:
    """This process's rows of a batch-sharded global result — the inverse
    of ``global_image_batch`` on the output side: each host fetches ONLY
    the results for the images it fed (no cross-host traffic). Use
    ``allgather_to_host`` when every host needs every row instead.

    Only valid for results sharded on dim 0 alone (pred/conf/probs/bbox
    from the detect paths, features from the pure-dp megakernel): with a
    replicated output every device holds the same rows, so shards are
    deduplicated by their dim-0 slice.
    """
    blocks = {}
    for s in global_out.addressable_shards:
        start = s.index[0].start if s.index[0].start is not None else 0
        if start not in blocks:
            blocks[start] = np.asarray(s.data)
    return np.concatenate([blocks[k] for k in sorted(blocks)], axis=0)


def allgather_to_host(x) -> np.ndarray:
    """Fetch a (possibly cross-host sharded) global array to host numpy on
    EVERY process — one all-gather over DCN, then a local device_get."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


class MultiHostEngine:
    """SPMD per-host inference engine over EVERY chip of every host.

    Construct it identically on every process (after ``init_multihost``)
    and call ``detect_batch``/``run_batch`` COLLECTIVELY — the calls are
    one global SPMD program, so all ranks must make them together. Each
    host feeds its OWN frames and receives results for exactly those
    frames (``local_rows`` — no cross-host result traffic; the natural
    shape for one serving front end per host). Uneven per-host batches
    are handled by a padding consensus (every rank pads to the largest
    padded local count, so the global shape agrees).

    Pure data parallelism over the global device list — the multi-host
    lift of ``MeshEngine``, whose compiled detect/forward programs and
    backend selection (production megakernel vs XLA path) it reuses.
    Reference analogue: none — SURVEY §2.5's comm backend is a single
    AXI bus; this is TPU-native scale-out across DCN.
    """

    def __init__(self, model, backend: str = "auto", box_mode: str = "ref"):
        from tpu_cnn.parallel.mesh import MeshEngine, make_mesh

        self._inner = MeshEngine(
            model, mesh=make_mesh(model_axis=1), backend=backend,
            box_mode=box_mode,
        )
        self.model = model
        self.mesh = self._inner.mesh
        self.backend = "multihost:" + self._inner.backend
        # this host's pad multiple: its LOCAL device count x the backend's
        # per-shard batch tile (hosts may join with unequal device counts
        # via init_multihost's local_device_ids — deriving from the local
        # count keeps each host's rows matching its own shards)
        shard_tile = self._inner._batch_mult // self.mesh.devices.size
        self._local_mult = max(1, jax.local_device_count() * shard_tile)
        if jax.process_count() > 1:
            # the equal-rows padding consensus below assumes every host
            # owns an equal share of the data axis — refuse an uneven
            # topology up front instead of mis-sharding at the first batch
            import jax.numpy as jnp
            from jax.experimental import multihost_utils

            counts = np.asarray(multihost_utils.process_allgather(
                jnp.asarray([jax.local_device_count()], jnp.int32)
            )).ravel()
            if int(counts.min()) != int(counts.max()):
                raise ValueError(
                    "MultiHostEngine needs a homogeneous topology (equal "
                    f"local device counts per host; saw {counts.tolist()})"
                )

    def set_shifts(self, *shifts: int) -> None:
        self._inner.set_shifts(*shifts)

    def _stage(self, images: np.ndarray):
        """Pad this host's frames by consensus and lift them to ONE global
        batch (process-local shards stay on their host)."""
        import jax.numpy as jnp
        from jax.experimental import multihost_utils

        s = self.model.config.img_size
        images = np.ascontiguousarray(
            np.asarray(images, np.uint8).reshape(-1, s, s)
        )  # reshape pins the frame dims even for an EMPTY local batch
        b = len(images)
        m = self._local_mult
        pb = ((b + m - 1) // m) * m
        if jax.process_count() > 1:
            # consensus: the SPMD program's global shape must agree even
            # with uneven (or zero) per-host tails
            pb = int(np.asarray(multihost_utils.process_allgather(
                jnp.asarray([pb], jnp.int32)
            )).max())
        pb = max(pb, m)
        if pb != b:
            images = np.concatenate(
                [images, np.zeros((pb - b, s, s), np.uint8)]
            )
        return global_image_batch(self.mesh, images), b

    def warmup(self, batch: int = 1) -> None:
        s = self.model.config.img_size
        self.detect_batch(np.zeros((batch, s, s), np.uint8))

    def run_batch(self, images: np.ndarray) -> np.ndarray:
        g, b = self._stage(images)
        feats = self._inner._forward(g, self._inner._shifts)
        feats.copy_to_host_async()
        return local_rows(feats)[:b]

    def detect_batch(self, images: np.ndarray):
        from tpu_cnn.engine.tpu import DetectResult

        g, b = self._stage(images)
        pred, conf, probs, bbox = self._inner._detect(g, self._inner._shifts)
        for a in (pred, conf, probs, bbox):  # overlap the four D2H copies
            a.copy_to_host_async()
        return DetectResult(
            local_rows(pred)[:b], local_rows(conf)[:b],
            local_rows(probs)[:b], local_rows(bbox)[:b],
        )
