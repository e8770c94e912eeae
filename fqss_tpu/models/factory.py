"""Model factory: name -> quantized model + float teacher + loaded weights.

TPU equivalent of the reference factory
(reference: quantization/qat/models/load_model.py:11-102 and
train_env/train_utils.py:8-27). Because quantization here is declarative
(QuantSpec threaded at construction) there is no surgery step: the float
teacher is the same module class with the quantization plan disabled, and
``enable_observer``/``set_mac_op`` become constructor/apply options rather
than module walks.

Checkpoint formats accepted by :func:`load_pretrained_variables`:
* ``.pth`` torch files (reference float checkpoints) — converted through
  fqss_tpu.models.convert with splitter encoder widening;
* orbax/np ``.npz``/msgpack trees saved by this framework.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from fqss_tpu.models.convtasnet import ConvTasNet
from fqss_tpu.quant.spec import QuantSpec

MODEL_NAMES = ("ConvTasNet", "DPTNet", "Sepformer", "ConvTasNetMusic", "HTDemucs")


def create_model(model_cfg: Mapping[str, Any], q: QuantSpec | None = None):
    """Build a model by config name (load_model.py:21-51)."""
    name = model_cfg["name"]
    if q is None:
        q = QuantSpec.from_config(model_cfg.get("quantization"))
        if not model_cfg.get("quantization", {}).get("qat", False):
            q = QuantSpec()
    if name == "ConvTasNet":
        # Arch-size keys beyond the reference's (n_src, kernel_size, stride)
        # are optional extensions for small smoke configs.
        extra = {
            k: model_cfg[k]
            for k in ("n_filters", "bn_chan", "hid_chan", "n_blocks", "n_repeats", "mask_act", "mask_kernel_size")
            if k in model_cfg
        }
        return ConvTasNet(
            n_srcs=model_cfg.get("n_src", 1),
            kernel_size=model_cfg.get("kernel_size", 32),
            stride=model_cfg.get("stride", 16),
            q=q,
            **extra,
        )
    if name == "DPTNet":
        from fqss_tpu.models.dptnet import DPTNet

        extra = {k: model_cfg[k] for k in ("enc_dim", "feature_dim", "hidden_dim", "layer", "segment_size") if k in model_cfg}
        return DPTNet(
            n_srcs=model_cfg.get("n_src", 2),
            kernel_size=model_cfg.get("kernel_size", 2),
            q=q,
            **extra,
        )
    if name == "Sepformer":
        from fqss_tpu.models.sepformer import Sepformer

        extra = {k: model_cfg[k] for k in ("n_filters", "n_repeats", "n_heads", "chunk_size", "n_ffn", "n_layers") if k in model_cfg}
        return Sepformer(
            n_srcs=model_cfg.get("n_src", 2),
            kernel_size=model_cfg.get("kernel_size", 16),
            stride=model_cfg.get("stride", 8),
            q=q,
            **extra,
        )
    if name == "ConvTasNetMusic":
        from fqss_tpu.models.convtasnet_music import ConvTasNetMusic

        extra = {k: model_cfg[k] for k in ("audio_channels", "n_filters", "bn_chan", "hid_chan", "conv_kernel", "n_blocks", "n_repeats", "mask_act") if k in model_cfg}
        return ConvTasNetMusic(
            sources=tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"])),
            kernel_size=model_cfg.get("kernel_size", 20),
            stride=model_cfg.get("stride", 10),
            q=q,
            **extra,
        )
    if name == "HDemucsLegacy":
        # the reference's legacy hybrid model (hdemucsq.py) is dead code in
        # its factory (load_model.py:22-49); exposed here as a first-class
        # entry.
        from fqss_tpu.models.hdemucs import HDemucs as HDemucsLegacy

        extra = {k: model_cfg[k] for k in ("audio_channels", "channels", "nfft", "depth",
                                           "multi_freqs", "multi_freqs_depth", "cac",
                                           "wiener_iters", "samplerate", "segment") if k in model_cfg}
        if "multi_freqs" in extra:
            extra["multi_freqs"] = tuple(extra["multi_freqs"])
        return HDemucsLegacy(
            sources=tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"])),
            q=q,
            **extra,
        )
    if name == "HTDemucs":
        from fqss_tpu.models.htdemucs import HTDemucs

        extra = {k: model_cfg[k] for k in ("audio_channels", "channels", "nfft", "depth", "t_layers",
                                           "t_heads", "t_hidden_scale", "bottom_channels", "segment",
                                           "samplerate") if k in model_cfg}
        return HTDemucs(
            sources=tuple(model_cfg.get("sources", ["drums", "bass", "other", "vocals"])),
            q=q,
            **extra,
        )
    raise ValueError(f"Model {name} is not supported! ({MODEL_NAMES})")


def quant_spec_from_cfg(model_cfg: Mapping[str, Any], observer: bool | None = None) -> QuantSpec:
    """QuantSpec from model_cfg['quantization'] (load_model.py:53-74).

    ``observer`` overrides the config's observer flag (val.py disables it)."""
    q = QuantSpec.from_config(model_cfg.get("quantization"))
    if observer is not None:
        import dataclasses

        q = dataclasses.replace(q, observer=observer)
    return q


def load_pretrained_variables(model, model_path: str, example_input, rng=None) -> dict:
    """Init variables, then load weights from a checkpoint path.

    Torch .pth float checkpoints go through the layout converter; 'state' /
    'state_dict' wrappers and 'fmodel.*' teacher keys are handled like
    load_model.py:85-102 / convtasnetq.py:225-237.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = dict(model.init(rng, example_input))
    if model_path is None:
        return variables
    if model_path.endswith((".pth", ".pt", ".ckpt")):
        import torch

        sd = torch.load(model_path, map_location="cpu", weights_only=False)
        for key in ("state", "state_dict"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
        sd = {k: v for k, v in sd.items() if not k.startswith("fmodel.")}
        sd = {k.removeprefix("model."): v.detach().numpy() for k, v in sd.items()}
        params = _torch_to_params(model, sd)
        # merge handles splitter widening AND preserves QAT-only params
        variables["params"] = merge_float_params(variables["params"], params, model.q.n_splitter)
        return variables
    # Framework-native checkpoints (orbax dir or npz).
    from fqss_tpu.train.checkpoints import restore_variables

    return restore_variables(model_path, variables)


def _torch_to_params(model, sd: dict) -> dict:
    from fqss_tpu.models import convert

    if isinstance(model, ConvTasNet):
        return convert.convtasnet_params_from_torch(sd, n_repeats=model.n_repeats, n_blocks=model.n_blocks)
    from fqss_tpu.models.convtasnet_music import ConvTasNetMusic
    from fqss_tpu.models.dptnet import DPTNet
    from fqss_tpu.models.sepformer import Sepformer

    if isinstance(model, DPTNet):
        return convert.dptnet_params_from_torch(sd, layer=model.layer)
    if isinstance(model, Sepformer):
        return convert.sepformer_params_from_torch(sd, n_repeats=model.n_repeats, n_layers=model.n_layers)
    if isinstance(model, ConvTasNetMusic):
        return convert.convtasnet_music_params_from_torch(sd, n_repeats=model.n_repeats, n_blocks=model.n_blocks)
    from fqss_tpu.models.htdemucs import HTDemucs

    if isinstance(model, HTDemucs):
        return convert.htdemucs_params_from_torch(
            sd, depth=model.depth, t_layers=model.t_layers, dconv_depth=model.dconv_depth
        )
    raise NotImplementedError(f"torch import not yet wired for {type(model).__name__}")


def create_pretrained_model(model_cfg: Mapping[str, Any], example_input, observer: bool | None = None):
    """(model, variables): quantized model with loaded weights
    (load_model.py:76-102)."""
    q = quant_spec_from_cfg(model_cfg, observer)
    model = create_model(model_cfg, q)
    variables = load_pretrained_variables(model, model_cfg.get("model_path"), example_input)
    # A state exported mid-observer carries full MSE histograms but no
    # calibrated ranges (the reference would calibrate inline on the next
    # forward, qat_quant.py:306-326); finish the calibration on import so
    # eval/serving quantizes instead of silently running the float branch.
    if variables.get("qstats"):
        from fqss_tpu.quant.calibration import calibrate_mse_quantizers, has_pending_mse

        if has_pending_mse(variables["qstats"]):
            variables = calibrate_mse_quantizers(variables)
    return model, variables


def create_model_and_teacher(model_cfg: Mapping[str, Any], pretrained: str | None, example_input):
    """(qmodel, qvars, teacher, teacher_params) for KD training
    (train_utils.py:8-27: float weights loaded, teacher deep-copied, then
    the student is quantized)."""
    q = quant_spec_from_cfg(model_cfg)
    teacher = create_model(model_cfg, QuantSpec())
    tvars = load_pretrained_variables(teacher, pretrained, example_input)
    model = create_model(model_cfg, q)
    qvars = dict(model.init(jax.random.PRNGKey(0), example_input))
    if pretrained is not None:
        qvars["params"] = merge_float_params(qvars["params"], tvars["params"], q.n_splitter)
    return model, qvars, teacher, tvars["params"]


def merge_float_params(q_init_params: dict, float_params: dict, n_splitter: int = 1,
                       lsb_init: str = "gauss") -> dict:
    """Load float-teacher weights into a QAT param tree.

    Shared parameters are overwritten from the float model; QAT-only
    parameters (combiner residual blocks, etc.) keep their init; the encoder
    kernel is splitter-widened when the shapes differ — ``lsb_init="gauss"``
    is the reference's Gaussian-matched scheme (qat_layers.py:1009-1026),
    ``"zeros"`` starts the merged model at exactly float(MSB-plane) (see
    expand_encoder_kernel).
    """
    from fqss_tpu.nn.io_layers import expand_encoder_kernel

    def walk(qnode, fnode):
        if not isinstance(qnode, dict):
            qv = jnp.asarray(qnode)
            fv = jnp.asarray(fnode)
            if qv.shape == fv.shape:
                return fv
            # splitter-widened conv1d (k, Ci, Co) or conv2d (kh, kw, Ci, Co)
            if qv.ndim == fv.ndim and qv.ndim in (3, 4) and qv.shape[-2] == n_splitter * fv.shape[-2]:
                return expand_encoder_kernel(fv, n_splitter, jax.random.PRNGKey(1), lsb_init=lsb_init)
            raise ValueError(
                f"Error: mismatch model weights ({fv.shape} vs {qv.shape}). "
                "Please check if the model configuration matches the checkpoint."
            )
        out = {}
        for k, qv in qnode.items():
            out[k] = walk(qv, fnode[k]) if (isinstance(fnode, dict) and k in fnode) else qv
        return out

    return walk(q_init_params, float_params)
