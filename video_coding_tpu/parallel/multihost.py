"""Multi-host (pod-slice) codec pipelines.

BASELINE.json configs 4-5: Motion-JPEG streams sharded across the chips of
one or more hosts. The single-controller jax.distributed model applies
directly: every process runs this same code, contributes its local chips
to the global mesh, feeds its local shard of frames, and the shardings
defined in parallel/pipeline.py handle the rest (collectives ride ICI
within a host and DCN across hosts — XLA picks per the mesh layout).

On a single process this degenerates to the local mesh, which is how the
CPU test tier exercises it (the reference's Cyclesim analog: SURVEY.md §4
"multi-node without a real cluster").
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import codec_mesh
from .pipeline import mjpeg_codec_step


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the distributed runtime. No-op for single-process runs.

    On a pod slice launch one process per host with:
        initialize("host0:1234", num_processes=N, process_id=i)
    """
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def global_codec_mesh(seg_parallel: int | None = None) -> Mesh:
    """Codec mesh over every device of every participating process."""
    return codec_mesh(len(jax.devices()), seg_parallel,
                      devices=jax.devices())


def local_frames_to_global(mesh: Mesh, local_frames: np.ndarray):
    """Assemble each process's local frame shard into one global array
    sharded over the 'data' axis (frames) of the mesh.

    local_frames: (F_local, N, 8, 8) — this process's frames."""
    sharding = NamedSharding(mesh, P("data", None, None, None))
    if jax.process_count() == 1:
        return jax.device_put(local_frames, sharding)
    return jax.make_array_from_process_local_data(sharding, local_frames)


def mjpeg_multihost_step(mesh: Mesh, local_frames: np.ndarray,
                         quant: np.ndarray):
    """One frame-sharded codec step over the (multi-host) mesh.

    Every process passes its local (F_local, N, 8, 8) frames; the step
    runs with frames sharded across 'data' (spanning hosts) and blocks
    across 'seg', returning the same outputs as mjpeg_codec_step."""
    global_frames = local_frames_to_global(mesh, local_frames)
    return mjpeg_codec_step(mesh, global_frames, quant)
