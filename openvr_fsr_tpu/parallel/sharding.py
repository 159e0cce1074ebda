"""Multi-chip scaling via jax.sharding.

The reference is a single-GPU, in-process shim — its only concurrency is the
workgroup grid (SURVEY.md §2). The TPU-native scaling story for batched
streams (stereo pairs, video) is data parallelism over a device mesh: shard
the batch (eye/frame) dim with NamedSharding and let each chip run the whole
per-frame kernel locally. No collectives are needed in the hot path (frames
are independent); halo exchange is unnecessary because we shard on batch, not
space. ICI is only touched if the caller reshards.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "ShardedPipeline"]


def make_mesh(n_devices=None, axis="batch"):
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(arr, mesh, axis="batch"):
    """Place `arr` with its leading dim sharded across the mesh."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


class ShardedPipeline:
    """Batch-data-parallel wrapper around api.Pipeline.

    frames (B, H, W, 4) with B a multiple of mesh size: each device processes
    B/n frames with the identical per-frame program; outputs stay sharded.
    """

    def __init__(self, pipeline, mesh=None):
        from ..api.pipeline import Pipeline  # noqa: F401 (type only)

        self.pipeline = pipeline
        self.mesh = mesh or make_mesh()

    def process(self, frames, eyes=None):
        frames = jnp.asarray(frames)
        b = frames.shape[0]
        n = self.mesh.devices.size
        if b % n != 0:
            raise ValueError(f"batch {b} not divisible by mesh size {n}")
        sharded = shard_batch(frames, self.mesh)
        # The per-frame program is identical across devices (masks repeat per
        # stereo pair), so jit with sharded inputs runs SPMD with no
        # collectives.
        return self.pipeline.process(sharded, eyes=eyes)
