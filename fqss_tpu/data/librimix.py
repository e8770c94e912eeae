"""LibriMix dataset (CSV-driven) with a double-buffered host pipeline.

TPU-native redesign of the reference LibriMix Dataset
(reference: train_env/asteroid_librimix/librimix_dataset.py:25-170):
CSV metadata, tasks enh_single/enh_both/sep_clean/sep_noisy, random
fixed-length segment crops, on-the-fly resampling (``resample`` factor, e.g.
0.5 for 16k->8k), and optional SNR-remix augmentation. Batches are assembled
on the host in numpy and prefetched on a background thread so the TPU never
waits on WAV decode (the reference used torch DataLoader workers).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Iterator

import numpy as np
import pandas as pd

from fqss_tpu.data.augment import augmentation_2mix, augmentation_3mix, generate_mix_noise
from fqss_tpu.utils.audio import read_audio, resample_audio


class LibriMix:
    """Indexable LibriMix view over a metadata CSV directory."""

    def __init__(
        self,
        csv_dir: str,
        task: str = "sep_clean",
        sample_rate: int = 16000,
        resample: float = 1.0,
        n_src: int = 2,
        segment: float | None = 3,
        augmentation_cfg: dict | None = None,
        speed_perturb: bool = False,
        speeds: tuple[int, ...] = (95, 100, 105),
        rand_shift: bool = False,
        shift_range: tuple[int, int] = (-8000, 8000),
        wavedrop: bool = False,
        seed: int = 0,
    ):
        self.csv_dir = csv_dir
        self.task = task
        self.resample = resample
        self.sample_rate = sample_rate
        self.n_src = n_src
        self.augmentation_cfg = augmentation_cfg if (augmentation_cfg or {}).get("enable") else None
        # speechbrain speed-perturb (speechbrain_librimix_trainer.py:52-57,
        # add_speed_perturb): each source resampled by an independent random
        # speed, mixture re-summed from the perturbed sources.
        self.speed_perturb = speed_perturb
        self.speeds = tuple(speeds)
        # speechbrain use_rand_shift / use_wavedrop
        # (speechbrain_librimix_trainer.py:70-72,284-295).
        self.rand_shift = rand_shift
        self.shift_range = tuple(shift_range)
        self.wavedrop = wavedrop
        self.rng = np.random.default_rng(seed)
        self.pyrng = random.Random(seed)

        files = os.listdir(csv_dir)
        if task == "enh_single":
            md = [f for f in files if "single" in f][0]
        elif task == "enh_both":
            md = [f for f in files if "both" in f][0]
            clean = [f for f in files if "clean" in f][0]
            self.df_clean = pd.read_csv(os.path.join(csv_dir, clean))
        elif task == "sep_clean":
            md = [f for f in files if "clean" in f][0]
        elif task == "sep_noisy":
            md = [f for f in files if "both" in f][0]
        else:
            raise ValueError(f"Unknown task {task}")
        self.df = pd.read_csv(os.path.join(csv_dir, md))

        if segment is not None:
            self.seg_len = int(segment * sample_rate)
            before = len(self.df)
            self.df = self.df[self.df["length"] >= self.seg_len]
            dropped = before - len(self.df)
            if dropped:
                print(f"Drop {dropped} utterances from {before} (shorter than {segment} seconds)")
        else:
            self.seg_len = None

    def __len__(self) -> int:
        return len(self.df)

    def _read(self, path: str, start: int, stop: int | None) -> np.ndarray:
        # seek-read only the crop (native decoder; 10x+ faster than a full
        # file read on the single-core host feeding the TPU)
        from fqss_tpu.native import read_wav_segment

        n = -1 if stop is None else stop - start
        wav, _ = read_wav_segment(path, start, n)
        wav = wav[0]
        if self.resample != 1:
            wav = resample_audio(wav, self.sample_rate, int(self.resample * self.sample_rate))
        return wav

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (mixture [T], sources [n_src, T])."""
        row = self.df.iloc[idx]
        if self.seg_len is not None:
            start = self.pyrng.randint(0, int(row["length"]) - self.seg_len)
            stop = start + self.seg_len
        else:
            start, stop = 0, None

        noise = None
        if self.task in ("enh_single", "sep_noisy"):
            noise = self._read(row["noise_path"], start, stop)

        if self.task == "enh_both":
            sources = [self._read(self.df_clean.iloc[idx]["mixture_path"], start, stop)]
        else:
            sources = [self._read(row[f"source_{i + 1}_path"], start, stop) for i in range(self.n_src)]
        sources_arr = np.stack(sources)

        if self.augmentation_cfg and self.rng.uniform() < self.augmentation_cfg.get("prob", 1):
            cfg = self.augmentation_cfg
            if self.task == "enh_single":
                mixture = augmentation_2mix(self.rng, sources_arr[0], noise, cfg)
            elif self.task == "sep_clean" and self.n_src == 2:
                mixture = augmentation_2mix(self.rng, sources_arr[0], sources_arr[1], cfg)
            elif self.task == "sep_clean" and self.n_src == 3:
                mixture = augmentation_3mix(self.rng, *sources_arr[:3], cfg)
            elif self.task == "sep_noisy":
                if self.n_src == 2:
                    mixture = augmentation_2mix(self.rng, sources_arr[0], sources_arr[1], cfg)
                else:
                    mixture = augmentation_3mix(self.rng, *sources_arr[:3], cfg)
                mixture = generate_mix_noise(mixture, noise, self.rng.uniform(6, 18))
            else:
                raise ValueError("Augmentation is not supported for this task")
        else:
            mixture = self._read(row["mixture_path"], start, stop)

        if self.speed_perturb or self.rand_shift:
            mixture, sources_arr = self._apply_speed_perturb(sources_arr, noise)

        if self.wavedrop:
            from fqss_tpu.data.augment import wavedrop as _wd

            mixture = _wd(self.rng, mixture)

        return mixture.astype(np.float32), sources_arr.astype(np.float32)

    def _apply_speed_perturb(self, sources_arr: np.ndarray, noise: np.ndarray | None):
        """Per-source random-speed resample, then mix = sum of perturbed
        sources (+ noise for noisy tasks) — speechbrain add_speed_perturb
        followed by ``mix = targets.sum(-1)``
        (speechbrain_librimix_trainer.py:52-69,210-236). Lengths are restored
        to the original segment length by crop/zero-pad so batches stay
        static-shaped for XLA."""
        from fqss_tpu.data.augment import speed_perturb as _sp

        t_len = sources_arr.shape[-1]
        out = np.zeros_like(sources_arr)
        for i in range(sources_arr.shape[0]):
            w = _sp(self.rng, sources_arr[i], speeds=self.speeds) if self.speed_perturb else sources_arr[i]
            n = min(t_len, w.shape[-1])
            out[i, :n] = w[:n]
        if self.rand_shift:
            from fqss_tpu.data.augment import rand_shift as _rs

            for i in range(out.shape[0]):
                out[i] = _rs(self.rng, out[i], *self.shift_range)
        mixture = out.sum(axis=0)
        if noise is not None and self.task in ("enh_single", "sep_noisy"):
            n = min(t_len, noise.shape[-1])
            mixture[:n] = mixture[:n] + noise[:n]
        return mixture, out


def batch_iterator(
    dataset: LibriMix,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    prefetch: int = 2,
    epoch: int = 0,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Threaded prefetching batch iterator -> (mix [B, T], src [B, S, T]).

    The epoch-seeded shuffle mirrors DistributedSampler.set_epoch
    (musdbhq_train.py:52-56); sharding across devices happens at
    device_put time (fqss_tpu.parallel.shard_batch), not here.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    n = (len(order) // batch_size) * batch_size if drop_last else len(order)
    order = order[:n]

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            items = [dataset[int(j)] for j in idxs]
            mix = np.stack([m for m, _ in items])
            src = np.stack([s for _, s in items])
            q.put((mix, src))
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        yield item


MINI_URL = "https://zenodo.org/record/3871592/files/MiniLibriMix.zip?download=1"


def mini_download(root: str = ".", url: str = MINI_URL, timeout: float = 30.0) -> str:
    """Download + unpack MiniLibriMix from zenodo into ``root``.

    Mirrors the reference LibriMix.mini_download
    (librimix_dataset.py:237-262): fetch MiniLibriMix.zip (cached), extract
    train/ val/ metadata/, and reorder metadata CSVs into per-split
    metadata/{train,val}/ directories. Returns the metadata directory path.
    Raises URLError/OSError when the environment has no network egress —
    callers (and tests) should fall back to :func:`make_mini_librimix`.
    """
    import shutil
    import urllib.request
    import zipfile

    mini_dir = os.path.join(root, "MiniLibriMix")
    os.makedirs(mini_dir, exist_ok=True)
    zip_path = os.path.join(mini_dir, "MiniLibriMix.zip")
    if not os.path.isfile(zip_path):
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(zip_path + ".part", "wb") as f:
            shutil.copyfileobj(resp, f)
        os.replace(zip_path + ".part", zip_path)
    if not all(os.path.isdir(os.path.join(mini_dir, d)) for d in ("train", "val", "metadata")):
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(root)
    src = os.path.join(mini_dir, "metadata")
    for mode in ("train", "val"):
        dst = os.path.join(src, mode)
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(src):
            p = os.path.join(src, f)
            if mode in f and os.path.isfile(p):
                shutil.copyfile(p, os.path.join(dst, f))
    return src


def mini_from_download(root: str = ".", task: str = "sep_clean", **kwargs):
    """Download MiniLibriMix and return (train_set, val_set) LibriMix views
    (reference librimix_dataset.py:199-232). 8 kHz only, clean/noisy tasks."""
    assert task in ("sep_clean", "sep_noisy"), "MiniLibriMix supports sep_clean/sep_noisy"
    assert kwargs.get("sample_rate", 8000) == 8000, "MiniLibriMix is 8 kHz"
    meta = mini_download(root)
    train_set = LibriMix(os.path.join(meta, "train"), task=task, sample_rate=8000, **kwargs)
    val_set = LibriMix(os.path.join(meta, "val"), task=task, sample_rate=8000, **kwargs)
    return train_set, val_set


def make_mini_librimix(root: str, n_train: int = 12, n_val: int = 4, sample_rate: int = 8000, seconds: float = 1.0, n_src: int = 2, seed: int = 0):
    """Build a tiny on-disk LibriMix-format dataset (WAVs + CSVs).

    The reference downloads MiniLibriMix from zenodo
    (librimix_dataset.py:172-262); this environment has no egress, so tests
    and smoke runs synthesize an equivalent directory structure instead.
    """
    from fqss_tpu.data.synthetic import synth_sources
    from fqss_tpu.utils.audio import save_audio

    rng = np.random.default_rng(seed)
    t_len = int(seconds * sample_rate)
    for split, n in (("train", n_train), ("val", n_val)):
        csv_dir = os.path.join(root, split)
        wav_dir = os.path.join(csv_dir, "wav")
        os.makedirs(wav_dir, exist_ok=True)
        rows = []
        for i in range(n):
            src = synth_sources(rng, 1, n_src, t_len, sample_rate)[0]
            mix = np.clip(src.sum(0), -0.99, 0.99)
            paths = {}
            for s in range(n_src):
                p = os.path.join(wav_dir, f"{split}_{i}_s{s + 1}.wav")
                save_audio(p, src[s], sample_rate)
                paths[f"source_{s + 1}_path"] = p
            mp = os.path.join(wav_dir, f"{split}_{i}_mix.wav")
            save_audio(mp, mix, sample_rate)
            rows.append({"mixture_ID": f"{split}_{i}", "mixture_path": mp, **paths, "length": t_len})
        pd.DataFrame(rows).to_csv(os.path.join(csv_dir, "mixture_clean.csv"), index=False)

    # test split in the eval directory layout (val.py:28-57: mix_clean/, s1/, s2/)
    test_dir = os.path.join(root, "test")
    for sub in ["mix_clean"] + [f"s{i + 1}" for i in range(n_src)]:
        os.makedirs(os.path.join(test_dir, sub), exist_ok=True)
    for i in range(n_val):
        src = synth_sources(rng, 1, n_src, t_len, sample_rate)[0]
        mix = np.clip(src.sum(0), -0.99, 0.99)
        save_audio(os.path.join(test_dir, "mix_clean", f"test_{i}.wav"), mix, sample_rate)
        for s in range(n_src):
            save_audio(os.path.join(test_dir, f"s{s + 1}", f"test_{i}.wav"), src[s], sample_rate)
    return os.path.join(root, "train"), os.path.join(root, "val")
