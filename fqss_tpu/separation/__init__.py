"""Separation-domain machinery: splitter/combiner, losses, metrics, OLA inference."""

from fqss_tpu.separation.losses import (
    fqss_kd_loss,
    fqss_kd_msb_loss,
    kd_sensitivity_weights,
    music_kd_l1_loss,
    nsdr_db,
    pairwise_sisdr_ratio,
    pit_neg_sisdr_db,
    pit_wsisdr_ratio,
)
from fqss_tpu.separation.metrics import (
    metric_evaluation,
    sdr_db,
    si_snr_db,
    snr_db,
    swap_channel_order,
)
from fqss_tpu.separation.ola import ola_infer, triangular_weight
from fqss_tpu.separation.splitter import postprocess, preprocess, split_msb_lsb
from fqss_tpu.separation.stoi import stoi

__all__ = [
    "preprocess",
    "postprocess",
    "split_msb_lsb",
    "fqss_kd_loss",
    "fqss_kd_msb_loss",
    "kd_sensitivity_weights",
    "music_kd_l1_loss",
    "nsdr_db",
    "pairwise_sisdr_ratio",
    "pit_neg_sisdr_db",
    "pit_wsisdr_ratio",
    "metric_evaluation",
    "sdr_db",
    "si_snr_db",
    "snr_db",
    "swap_channel_order",
    "ola_infer",
    "triangular_weight",
    "stoi",
]
