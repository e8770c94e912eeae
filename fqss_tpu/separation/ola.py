"""Overlap-add (OLA) chunked inference for long mixtures.

TPU-native redesign of the reference's recursive ``model_infer``
(reference: process.py:154-194): instead of a per-chunk Python model call,
all chunks are gathered into one leading axis and pushed through a single
jitted batch forward (one compile for any track length), then recombined on
the host with the reference's triangular cross-fade weights. Optional
per-chunk PIT re-alignment vs a target (swap_channel_order,
process.py:105-123) matches the reference's eval behavior.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.separation.metrics import swap_channel_order

Array = np.ndarray


def triangular_weight(segment: int) -> np.ndarray:
    """The reference's cross-fade window (process.py:164-166)."""
    w = np.concatenate([np.arange(1, segment // 2 + 1), np.arange(segment - segment // 2, 0, -1)])
    return (w / w.max()).astype(np.float32)


def ola_infer(
    apply_fn: Callable[[Array], Array],
    mix: np.ndarray,
    n_srcs: int = 1,
    segment: int | None = None,
    overlap: float = 0.25,
    target: np.ndarray | None = None,
    chunk_batch: int = 8,
    mesh=None,
    center_pad_to: int | None = None,
) -> np.ndarray:
    """Chunked separation of one track.

    apply_fn: jitted model forward over a [K, C, segment] (or [K, segment])
              batch of chunks -> [K, S, segment'] separations.
    mix: [C, T] numpy waveform. Returns [S, T] (or [S, C, T] for C > 1).

    ``mesh``: a 1-D device mesh to shard the chunk axis over — the OLA chunk
    axis is embarrassingly parallel (SURVEY.md §5 long-context scaling), so
    each device block of ``chunk_batch`` chunks runs concurrently and the
    host recombination is unchanged.

    ``center_pad_to``: demucs TensorChunk semantics
    (reference train_env/tasnet_musdbhq/musdbhq_utils.py:86-111 ``padded``):
    every chunk shorter than this length (the tail chunk; or all chunks when
    the model wants its fixed ``use_train_segment`` length) is padded to it
    CENTERED, using the real surrounding mixture as context where available
    and zeros past the track edges; the model output is center-trimmed back.
    None = plain right-zero-padding (the speech reference's process.py:176).
    """
    mix = np.asarray(mix, np.float32)
    channels, length = mix.shape

    if not segment:
        out = np.asarray(apply_fn(jnp.asarray(mix[None, 0] if channels == 1 else mix[None])))[0]
        pad = length - out.shape[-1]
        if pad > 0:
            out = np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
        return out[..., :length]

    stride = int((1 - overlap) * segment)
    offsets = list(range(0, length, stride))
    weight = triangular_weight(segment)

    pad_target = max(center_pad_to or segment, segment)
    # Gather chunks -> one device batch. Tail/short chunks are right-zero
    # padded (reference speech path) or center-padded with real mixture
    # context (demucs TensorChunk path) depending on center_pad_to.
    chunks = np.zeros((len(offsets), channels, pad_target), np.float32)
    chunk_lens = []
    trim_lefts = []
    for i, off in enumerate(offsets):
        stop = min(off + segment, length)
        clen = stop - off
        if center_pad_to is None:
            chunks[i, :, :clen] = mix[:, off:stop]
            trim_lefts.append(0)
        else:
            delta = pad_target - clen
            start = off - delta // 2
            end = start + pad_target
            cs, ce = max(0, start), min(length, end)
            chunks[i, :, cs - start : cs - start + (ce - cs)] = mix[:, cs:ce]
            trim_lefts.append(delta // 2)
        chunk_lens.append(clen)

    step = chunk_batch
    sharding = None
    if mesh is not None:
        from fqss_tpu.parallel.mesh import batch_sharding

        step = chunk_batch * mesh.devices.size
        sharding = batch_sharding(mesh, mesh.axis_names[0])

    outs = []
    for i in range(0, len(offsets), step):
        block = chunks[i : i + step]
        pad_n = step - block.shape[0]
        if pad_n:
            block = np.concatenate([block, np.zeros((pad_n, channels, pad_target), np.float32)])
        x = jnp.asarray(block[:, 0] if channels == 1 else block)
        if sharding is not None:
            x = jax.device_put(x, sharding)
        y = np.asarray(apply_fn(x))
        if pad_n:
            y = y[: step - pad_n]
        outs.append(y[..., :pad_target])
    chunk_out = np.concatenate(outs, axis=0)  # [K, S, (C,) pad_target]

    out_shape = (n_srcs, channels, length) if channels > 1 else (n_srcs, length)
    out = np.zeros(out_shape, np.float32)
    sum_weight = np.zeros(length, np.float32)
    for i, off in enumerate(offsets):
        clen = chunk_lens[i]
        tl = trim_lefts[i]
        co = chunk_out[i][..., tl : tl + clen]
        if target is not None and n_srcs > 1:
            co = swap_channel_order(co, target[..., off : off + clen])
        out[..., off : off + clen] += weight[:clen] * co
        sum_weight[off : off + clen] += weight[:clen]
    assert sum_weight.min() > 0
    return out / sum_weight
