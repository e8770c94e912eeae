"""MUSDB18-HQ dataset (per-track WAV folders) + demucs-style augmentations.

TPU-native redesign of the reference music data layer
(reference: train_env/tasnet_musdbhq/musdbhq_dataset.py): ``Wavset`` over
track folders with stride-windowed examples and mean/std normalization from
a metadata json; the Shift/FlipChannels/FlipSign/Scale/Remix augmentation
pipeline. Unlike the reference's torch modules, the augmentations are one
jittable batch transform executed on-device inside the train step — the
host only ships raw windows.

The reference assumes a prebuilt ``musdbhq.json``; :func:`build_metadata`
generates it from a track directory.
"""

from __future__ import annotations

import json
import math
import os
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from fqss_tpu.utils.audio import read_audio, wav_info

MIXTURE = "mixture"
EXT = ".wav"

Array = jax.Array


def build_metadata(root: str, sources: tuple[str, ...]) -> dict:
    """Per-track {length, samplerate, mean, std} like demucs's musdbhq.json."""
    meta = {}
    for name in sorted(os.listdir(root)):
        track_dir = os.path.join(root, name)
        if not os.path.isdir(track_dir):
            continue
        mix_path = os.path.join(track_dir, MIXTURE + EXT)
        if not os.path.exists(mix_path):
            continue
        wav, sr = read_audio(mix_path)
        meta[name] = {
            "length": wav.shape[-1],
            "samplerate": sr,
            "mean": float(wav.mean()),
            "std": float(wav.std()),
        }
    return meta


class Wavset:
    """Stride-windowed examples over per-track source WAVs
    (musdbhq_dataset.py:118-183). __getitem__ -> [n_sources, C, length]."""

    def __init__(
        self,
        root: str,
        metadata: dict,
        sources: tuple[str, ...],
        length: int | None = None,
        stride: int | None = None,
        normalize: bool = True,
        sample_rate: int = 44100,
    ):
        self.root = root
        self.metadata = OrderedDict(metadata)
        self.length = length
        self.stride = stride or length
        self.normalize = normalize
        self.sources = sources
        self.sample_rate = sample_rate
        self.num_examples = []
        for name, meta in self.metadata.items():
            track_length = int(self.sample_rate * meta["length"] / meta["samplerate"])
            if length is None or track_length < length:
                examples = 1
            else:
                examples = int(math.ceil((track_length - self.length) / self.stride) + 1)
            self.num_examples.append(examples)

    def __len__(self) -> int:
        return sum(self.num_examples)

    def get_file(self, name: str, source: str) -> str:
        return os.path.join(self.root, name, f"{source}{EXT}")

    def __getitem__(self, index: int) -> np.ndarray:
        for name, examples in zip(self.metadata, self.num_examples):
            if index >= examples:
                index -= examples
                continue
            meta = self.metadata[name]
            offset = 0
            if self.length is not None:
                offset = int(math.ceil(meta["samplerate"] * self.stride * index / self.sample_rate))
            wavs = []
            from fqss_tpu.native import read_wav_segment

            for source in self.sources:
                if self.length is not None:
                    num = int(math.ceil(meta["samplerate"] * self.length / self.sample_rate))
                    wav, _ = read_wav_segment(self.get_file(name, source), offset, num)
                else:
                    wav, _ = read_audio(self.get_file(name, source))
                wavs.append(wav)
            example = np.stack(wavs)  # [S, C, T]
            if self.normalize:
                example = (example - meta["mean"]) / meta["std"]
            if self.length:
                example = example[..., : self.length]
                pad = self.length - example.shape[-1]
                if pad > 0:
                    example = np.pad(example, [(0, 0), (0, 0), (0, pad)])
            return example.astype(np.float32)
        raise IndexError(index)


def get_musdb_wav_datasets(
    musdb_root: str,
    data_stride: int,
    sample_rate: int,
    samples: int,
    sources: tuple[str, ...],
    metadata_file: str | None = None,
    valid_tracks: list[str] | None = None,
) -> tuple[Wavset, Wavset]:
    """(train_set, valid_set) like musdbhq_dataset.py:191-206.

    Without a musdb package, the train/valid split comes from
    ``valid_tracks`` (explicit names) or the demucs convention of the last
    ~8 tracks when unspecified.
    """
    root = os.path.join(musdb_root, "train")
    if metadata_file and os.path.exists(metadata_file):
        metadata = json.load(open(metadata_file))
    else:
        metadata = build_metadata(root, sources)
        if metadata_file:
            tmp = metadata_file + ".tmp"
            json.dump(metadata, open(tmp, "w"))
            os.replace(tmp, metadata_file)
    names = list(metadata)
    if valid_tracks is None:
        n_valid = max(1, min(8, len(names) // 10)) if len(names) > 1 else 0
        valid_tracks = names[len(names) - n_valid :]
    metadata_train = {n: m for n, m in metadata.items() if n not in valid_tracks}
    metadata_valid = {n: m for n, m in metadata.items() if n in valid_tracks}
    train_set = Wavset(root, metadata_train, sources, length=samples, stride=data_stride, sample_rate=sample_rate)
    valid_set = Wavset(root, metadata_valid, (MIXTURE,) + tuple(sources), sample_rate=sample_rate)
    return train_set, valid_set


class RepitchedWavset:
    """Host-side repitch/retempo wrapper over a Wavset (the htdemucs recipe's
    RepitchedWrapper, wired via augment.repitch.proba —
    train_env/htdemucs_musdbhq/train.py:207-214).

    Like the reference, every example is cut to the worst-case post-stretch
    length ``(1 - max_tempo/100) * length`` so batch shapes stay static, and
    with probability ``proba`` all stems of an example are resampled by the
    SAME random pitch (semitones) + tempo (percent) factor. The reference
    shells out to SoundTouch; here the stretch is a polyphase resample (the
    combined pitch*tempo rate change), which keeps the augmentation host-only
    and dependency-free.
    """

    def __init__(self, dataset: Wavset, proba: float = 0.2, max_pitch: int = 2,
                 max_tempo: float = 12.0, tempo_std: float = 5.0, seed: int = 0):
        assert dataset.length is not None, "repitch needs fixed-length examples"
        self.dataset = dataset
        self.proba = proba
        self.max_pitch = max_pitch
        self.max_tempo = max_tempo
        self.tempo_std = tempo_std
        self.rng = np.random.default_rng(seed)
        self.out_length = int((1 - 0.01 * max_tempo) * dataset.length)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int) -> np.ndarray:
        from fqss_tpu.utils.audio import resample_audio

        example = self.dataset[index]  # [S, C, T]
        out = example[..., : self.out_length]
        if self.rng.uniform() < self.proba:
            semitones = int(self.rng.integers(-self.max_pitch, self.max_pitch + 1))
            tempo = float(np.clip(self.rng.normal(0, self.tempo_std), -self.max_tempo, self.max_tempo))
            factor = (2.0 ** (semitones / 12.0)) * (1.0 + tempo / 100.0)
            if abs(factor - 1.0) > 1e-3:
                stretched = resample_audio(example, 1000, max(1, int(round(1000 * factor))))
                out = stretched[..., : self.out_length]
                pad = self.out_length - out.shape[-1]
                if pad > 0:
                    out = np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, pad)])
        return np.ascontiguousarray(out, np.float32)


# ---------------------------------------------------------------------------
# On-device demucs augmentations (musdbhq_dataset.py:21-115) — one jittable
# transform over [B, n_sources, C, T] batches.
# ---------------------------------------------------------------------------


def augment_batch(
    rng: Array,
    wav: Array,
    shift: int = 8192,
    flip_channels: bool = True,
    flip_sign: bool = True,
    scale: tuple[float, float] | None = (0.25, 1.25),
    remix_group_size: int = 4,
) -> Array:
    """Shift -> FlipSign -> FlipChannels -> Scale -> Remix, vectorized.

    wav: [B, S, C, T] -> [B, S, C, T - shift].
    """
    b, s, c, t = wav.shape
    k_shift, k_sign, k_flip, k_scale, k_remix = jax.random.split(rng, 5)

    # Shift: per (batch, source) random offset
    if shift > 0:
        length = t - shift
        offsets = jax.random.randint(k_shift, (b, s, 1, 1), 0, shift)
        idx = jnp.arange(length)[None, None, None, :] + offsets
        wav = jnp.take_along_axis(wav, jnp.broadcast_to(idx, (b, s, c, length)), axis=3)
        t = length

    # FlipSign: per (batch, source) random sign
    if flip_sign:
        signs = jax.random.randint(k_sign, (b, s, 1, 1), 0, 2).astype(wav.dtype)
        wav = wav * (2 * signs - 1)

    # FlipChannels: per (batch, source) random LR swap (stereo only)
    if flip_channels and c == 2:
        left = jax.random.randint(k_flip, (b, s, 1, 1), 0, 2)
        lidx = jnp.broadcast_to(left, (b, s, 1, t))
        l_ch = jnp.take_along_axis(wav, lidx, axis=2)
        r_ch = jnp.take_along_axis(wav, 1 - lidx, axis=2)
        wav = jnp.concatenate([l_ch, r_ch], axis=2)

    # Scale: per (batch, source) uniform gain
    if scale is not None:
        gains = jax.random.uniform(k_scale, (b, s, 1, 1), minval=scale[0], maxval=scale[1])
        wav = wav * gains

    # Remix: shuffle sources within groups (group_size like the reference to
    # keep the distribution independent of the data-parallel width)
    g = remix_group_size or b
    if b % g == 0 and b > 1:
        groups = b // g
        w = wav.reshape(groups, g, s, c, t)
        perm = jnp.argsort(jax.random.uniform(k_remix, (groups, g, s, 1, 1)), axis=1)
        w = jnp.take_along_axis(w, jnp.broadcast_to(perm, w.shape), axis=1)
        wav = w.reshape(b, s, c, t)
    return wav


def make_mini_musdb(
    root: str, n_train: int = 3, n_test: int = 2,
    sources: tuple[str, ...] = ("drums", "bass", "other", "vocals"),
    sample_rate: int = 8000, seconds: float = 1.0, seed: int = 0,
) -> str:
    """Synthesize a tiny MUSDB-layout dataset (train/ and test/ track dirs
    with per-stem stereo WAVs). The no-egress analog of musdb download."""
    from fqss_tpu.data.synthetic import synth_sources
    from fqss_tpu.utils.audio import save_audio

    rng = np.random.default_rng(seed)
    t_len = int(seconds * sample_rate)
    for subset, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            track = os.path.join(root, subset, f"track_{i}")
            os.makedirs(track, exist_ok=True)
            stems = synth_sources(rng, 1, len(sources), t_len, sample_rate)[0]
            stereo = np.stack([stems, stems * 0.8], axis=1)  # [S, 2, T]
            mix = np.clip(stereo.sum(0), -0.99, 0.99)
            save_audio(os.path.join(track, "mixture.wav"), mix, sample_rate)
            for s, name in enumerate(sources):
                save_audio(os.path.join(track, f"{name}.wav"), stereo[s], sample_rate)
    return root
