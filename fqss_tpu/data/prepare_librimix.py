"""LibriMix metadata preparation (CSV builder).

Equivalent of the reference's speechbrain prep
(reference: train_env/speechbrain_librimix/prepare_data.py:16-211
``prepare_librimix``): scans a Libri2Mix/Libri3Mix directory tree
(<root>/<subset>/{mix_clean|mix_both|mix_single, s1, s2[, s3], noise}) and
writes the mixture/source CSVs the LibriMix dataset loader consumes.
"""

from __future__ import annotations

import csv
import os

from fqss_tpu.utils.audio import wav_info


def prepare_librimix(
    datapath: str,
    savepath: str,
    n_spks: int = 2,
    skip_prep: bool = False,
    fs: int = 16000,
) -> list[str]:
    """Build CSVs for every subset directory under ``datapath``.

    Returns the list of CSV paths written. Columns match the loader's
    expectations: mixture_ID, mixture_path, source_i_path..., noise_path
    (when present), length.
    """
    if skip_prep:
        return []
    os.makedirs(savepath, exist_ok=True)
    written = []
    for subset in sorted(os.listdir(datapath)):
        subset_dir = os.path.join(datapath, subset)
        if not os.path.isdir(subset_dir):
            continue
        mix_dir = None
        for cand in ("mix_clean", "mix_both", "mix_single"):
            if os.path.isdir(os.path.join(subset_dir, cand)):
                mix_dir = cand
                break
        if mix_dir is None:
            continue
        src_dirs = [f"s{i + 1}" for i in range(n_spks) if os.path.isdir(os.path.join(subset_dir, f"s{i + 1}"))]
        has_noise = os.path.isdir(os.path.join(subset_dir, "noise"))
        rows = []
        for fname in sorted(os.listdir(os.path.join(subset_dir, mix_dir))):
            if not fname.endswith(".wav"):
                continue
            mix_path = os.path.join(subset_dir, mix_dir, fname)
            n_frames, sr, _ = wav_info(mix_path)
            row = {
                "mixture_ID": os.path.splitext(fname)[0],
                "mixture_path": mix_path,
                "length": n_frames,
            }
            for i, sd in enumerate(src_dirs):
                row[f"source_{i + 1}_path"] = os.path.join(subset_dir, sd, fname)
            if has_noise:
                row["noise_path"] = os.path.join(subset_dir, "noise", fname)
            rows.append(row)
        if not rows:
            continue
        tag = "clean" if mix_dir == "mix_clean" else ("both" if mix_dir == "mix_both" else "single")
        out = os.path.join(savepath, f"{subset}_mixture_{tag}.csv")
        with open(out, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        written.append(out)
    return written
