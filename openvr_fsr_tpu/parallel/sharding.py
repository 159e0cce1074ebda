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

    frames (B, H, W, 4) — or (B, H, W) uint32 in the zero-copy packed mode —
    with B a multiple of mesh size: each device processes B/n frames with
    the identical per-frame program; outputs stay sharded.
    """

    def __init__(self, pipeline, mesh=None):
        from ..api.pipeline import Pipeline  # noqa: F401 (type only)

        self.pipeline = pipeline
        self.mesh = mesh or make_mesh()

    def process(self, frames, eyes=None, bounds=None, crop=False):
        """SPMD over the mesh via shard_map: every device runs the full
        per-frame program (including the Pallas kernels — custom calls are
        not auto-partitionable, so shard_map is the correct mechanism) on its
        local batch slice. No collectives in the hot path.

        bounds/crop mirror Pipeline.process: the first entry's
        VRTextureBounds_t decides the eye layout, and crop=True returns
        only the bounded output region (a local slice per shard — the
        batch sharding is untouched)."""
        from jax.sharding import PartitionSpec

        frames = jnp.asarray(frames)
        first_bounds = self.pipeline._apply_bounds_layout(bounds)
        if frames.dtype == jnp.uint32 and self.pipeline.color_bits != 8:
            raise ValueError("packed-u32 frames require color_bits=8")
        b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
        n = self.mesh.devices.size
        if b % n != 0:
            raise ValueError(f"batch {b} not divisible by mesh size {n}")
        local_b = b // n
        if eyes is None:
            eyes = tuple(i % 2 for i in range(b))
        else:
            eyes = tuple(int(e) for e in eyes)
        if not self.pipeline.single_eye_per_frame:
            # double-wide frames hold both eyes; per-entry eye indices are
            # ignored by masks/centres (Pipeline._masks), so normalize
            eyes = (0,) * b
        # every shard must see the same per-entry eye pattern
        pattern = eyes[:local_b]
        if eyes != pattern * n:
            raise ValueError(
                "per-shard eye pattern must repeat across shards "
                f"(local batch {local_b}); got {eyes}")

        axis = self.mesh.axis_names[0]
        # same key fields as Pipeline.process so mutating backend/precision/
        # color_bits between sharded calls re-specializes instead of reusing
        # the stale compiled fn
        key = ("shard", local_b, h, w, str(frames.dtype), pattern,
               self.pipeline.config, self.pipeline.color_bits,
               self.pipeline._resolve_backend(), self.pipeline.precision,
               self.pipeline.hdr_mode, self.pipeline.cas_max_color_delta, n)
        fn = self.pipeline._cache.get(key)
        if fn is None:
            local_fn = self.pipeline._build(local_b, h, w, pattern)
            spec = PartitionSpec(axis, *([None] * (frames.ndim - 1)))
            # check_vma=False: pallas_call out_shapes carry no vma metadata
            fn = jax.jit(jax.shard_map(local_fn, mesh=self.mesh,
                                       in_specs=(spec,), out_specs=spec,
                                       check_vma=False))
            self.pipeline._cache[key] = fn
        out = fn(shard_batch(frames, self.mesh, axis))
        if crop and first_bounds is not None:
            out = self.pipeline.crop_output(out, first_bounds)
        return out
