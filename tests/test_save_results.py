"""Per-utterance test_results.csv report (speechbrain env parity).

Reference: speechbrain_librimix_trainer.py:336-441 save_results — columns
snt_id, sdr, sdr_i, si-snr, si-snr_i per test sentence plus an "avg" row.
"""

import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fqss_tpu.models import ConvTasNet
from fqss_tpu.quant import QuantSpec
from fqss_tpu.train.validate import save_results
from fqss_tpu.utils.audio import save_audio


def _make_testset(root, n_files=2, n_spks=2, T=4000, sr=8000):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "mix_clean"))
    for k in range(n_spks):
        os.makedirs(os.path.join(root, f"s{k + 1}"))
    for i in range(n_files):
        srcs = rng.uniform(-0.4, 0.4, (n_spks, T)).astype(np.float32)
        for k in range(n_spks):
            save_audio(os.path.join(root, f"s{k + 1}", f"utt{i}.wav"), srcs[k][None], sr)
        save_audio(os.path.join(root, "mix_clean", f"utt{i}.wav"), srcs.sum(axis=0)[None], sr)


@pytest.mark.slow
def test_save_results_csv(tmp_path):
    test_dir = str(tmp_path / "test")
    work_dir = str(tmp_path / "work")
    os.makedirs(work_dir)
    _make_testset(test_dir)

    model = ConvTasNet(n_srcs=2, kernel_size=16, stride=8, n_filters=32, bn_chan=8,
                       hid_chan=16, n_blocks=2, n_repeats=1, q=QuantSpec())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4000)))

    avg = save_results(
        model, variables,
        model_cfg={"n_src": 2},
        dataset_cfg={},
        testing_cfg={"test_dir": test_dir, "segment_samples": None},
        work_dir=work_dir,
    )
    path = os.path.join(work_dir, "test_results.csv")
    assert os.path.exists(path)
    with open(path) as fh:
        rows = list(csv.DictReader(fh))
    assert [r["snt_id"] for r in rows] == ["utt0.wav", "utt1.wav", "avg"]
    assert set(rows[0]) == {"snt_id", "sdr", "sdr_i", "si-snr", "si-snr_i"}
    # avg row equals the mean of the per-utterance rows
    np.testing.assert_allclose(
        float(rows[-1]["si-snr"]), np.mean([float(r["si-snr"]) for r in rows[:-1]]), rtol=1e-5
    )
    assert set(avg) == {"sdr", "sdr_i", "si-snr", "si-snr_i"}
    # an untrained model separates ~nothing: improvements are finite numbers
    assert np.isfinite(avg["sdr_i"]) and np.isfinite(avg["si-snr_i"])
