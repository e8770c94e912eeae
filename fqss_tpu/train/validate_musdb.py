"""MUSDB18-HQ evaluation loops (reference: val.py:95-181).

``val_musdbhq_nsdr`` computes the MDX-definition NSDR per stem;
``val_musdbhq`` runs full BSS Eval v4 (fqss_tpu.separation.bss_eval):
framewise SDR/ISR/SIR/SAR with 1 s windows and 512-tap distortion filters,
aggregated median-over-frames then median-over-tracks like museval's
``agg_frames_tracks_scores``.

Both accept a device ``mesh`` to shard the OLA chunk axis across chips.
Tracks live in the musdb directory layout: <root>/test/<track>/{mixture,
drums, bass, other, vocals}.wav (is_wav=True in the reference).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.separation.ola import ola_infer
from fqss_tpu.separation.losses import nsdr_db
from fqss_tpu.utils.audio import read_audio


def list_musdb_tracks(root: str, subset: str = "test") -> list[str]:
    d = os.path.join(root, subset)
    tracks = sorted(
        t for t in os.listdir(d)
        if os.path.isdir(os.path.join(d, t)) and os.path.exists(os.path.join(d, t, "mixture.wav"))
    )
    assert len(tracks) > 0, "Dataset is missing files!"
    return [os.path.join(d, t) for t in tracks]


def _separate_track(model, variables, track_dir: str, sources, testing_cfg, train_flag=False, mesh=None, apply_fn=None):
    mix, fs = read_audio(os.path.join(track_dir, "mixture.wav"))  # [C, T]
    ref = mix.mean(axis=0)
    mix_mean, mix_std = float(ref.mean()), float(ref.std())
    mix_n = (mix - mix_mean) / mix_std

    from fqss_tpu.models.htdemucs import HTDemucs

    is_htd = isinstance(model, HTDemucs)
    if apply_fn is None:
        if is_htd:
            apply_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
        else:
            apply_fn = jax.jit(lambda x: model.apply(variables, x))
    seps = ola_infer(
        apply_fn, mix_n, n_srcs=len(sources),
        segment=testing_cfg.get("segment_samples"),
        overlap=testing_cfg.get("overlap", 0.25),
        mesh=mesh,
        # use_train_segment: chunks center-padded with real context to the
        # train segment (demucs TensorChunk, musdbhq_utils.py:86-111)
        center_pad_to=testing_cfg.get("segment_samples") if is_htd else None,
    )
    # valid-path nan guard (solver.py:325 torch.nan_to_num)
    seps = np.nan_to_num(seps)
    return seps * mix_std + mix_mean, fs


def val_musdbhq_nsdr(model, variables, model_cfg: Mapping[str, Any], testing_cfg: Mapping[str, Any], limit=None, mesh=None, apply_fn=None):
    """Mean NSDR + per-stem NSDRs (val.py:95-132)."""
    sources = tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"]))
    tracks = list_musdb_tracks(testing_cfg["test_dir"])
    if limit:
        tracks = tracks[:limit]
    sdrs = np.zeros((len(sources), len(tracks)))
    for j, track in enumerate(tracks):
        seps, _ = _separate_track(model, variables, track, sources, testing_cfg, mesh=mesh, apply_fn=apply_fn)
        for i, src in enumerate(sources):
            ref_audio, _ = read_audio(os.path.join(track, f"{src}.wav"))
            sep = seps[i][..., : ref_audio.shape[-1]]
            sdrs[i, j] = float(nsdr_db(jnp.asarray(ref_audio.reshape(1, -1)), jnp.asarray(np.asarray(sep).reshape(1, -1)))[0])
        if j % 10 == 0:
            print(f"\n****** Track {j + 1}/{len(tracks)} ******")
            for i, src in enumerate(sources):
                print(f"{src}: NSDR={sdrs[i, j]:0.3f}")
    per_src = sdrs.mean(axis=1)
    return (float(per_src.mean()), *[float(v) for v in per_src])


def val_musdbhq(model, variables, model_cfg: Mapping[str, Any], testing_cfg: Mapping[str, Any],
                limit=None, return_full: bool = False, filter_length: int = 512, mesh=None,
                apply_fn=None):
    """museval-grade BSS eval v4 (val.py:134-181): framewise SDR/ISR/SIR/SAR
    with 1 s windows, median over frames then median over tracks per stem
    (museval eval_mus_track + agg_frames_tracks_scores).

    Returns (mean_SDR, *per_source_SDR) like the reference; with
    ``return_full`` also the {SDR,ISR,SIR,SAR} per-source table.
    """
    from fqss_tpu.separation.bss_eval import aggregate_frames, bss_eval_images_framewise

    sources = tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"]))
    tracks = list_musdb_tracks(testing_cfg["test_dir"])
    if limit:
        tracks = tracks[:limit]
    keys = ("SDR", "ISR", "SIR", "SAR")
    track_scores = {k: np.zeros((len(sources), len(tracks))) for k in keys}
    for j, track in enumerate(tracks):
        seps, fs = _separate_track(model, variables, track, sources, testing_cfg, mesh=mesh, apply_fn=apply_fn)
        refs = []
        for src in sources:
            ref_audio, _ = read_audio(os.path.join(track, f"{src}.wav"))
            refs.append(ref_audio)
        t_len = min(min(r.shape[-1] for r in refs), seps.shape[-1])
        refs = np.stack([r[..., :t_len] for r in refs])  # [S, C, T]
        ests = np.asarray(seps)[..., :t_len]
        if ests.ndim == 2:
            ests = ests[:, None, :]
        if refs.ndim == 2:
            refs = refs[:, None, :]
        frames = bss_eval_images_framewise(refs, ests, window=fs, hop=fs, filter_length=filter_length)
        agg = aggregate_frames(frames)
        for k in keys:
            track_scores[k][:, j] = agg[k]
        if j % 10 == 0:
            print(f"track {j + 1}/{len(tracks)}: " + ", ".join(
                f"{s} SDR={track_scores['SDR'][i, j]:0.2f}" for i, s in enumerate(sources)))
    per_src = {k: np.nanmedian(track_scores[k], axis=1) for k in keys}
    sdr = per_src["SDR"]
    result = (float(sdr.mean()), *[float(v) for v in sdr])
    if return_full:
        full = {k: {s: float(v) for s, v in zip(sources, per_src[k])} for k in keys}
        return result, full
    return result
