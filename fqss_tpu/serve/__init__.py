"""TPU serving runtime: weight folding and int8 MXU inference engines.

The reference's deployment story stops at freezing grids into torch.ao
modules (reference qat_utils.py:334-351). This package goes further:

* :func:`fold_quantized_weights` — pre-apply the weight fake-quant once at
  load (bitwise-equal forward, works for every model family);
* int8 engines — execute the FLOP-dominant matmuls of a QAT checkpoint as
  true s8 x s8 -> s32 MXU ops with int8-materialized activations
  (ConvTasNet, ConvTasNet-music, Sepformer, DPTNet);
* :func:`make_int8_engine` — model-type dispatch used by infer.py/val.py;
* :class:`StreamingSeparator` — real-time chunked separation of unbounded
  streams with bounded latency (sample-identical to offline OLA).
"""

from fqss_tpu.serve.autopath import auto_serving_model, best_path
from fqss_tpu.serve.convtasnet_int8 import ConvTasNetInt8Engine
from fqss_tpu.serve.fold import fold_quantized_weights
from fqss_tpu.serve.streaming import StreamingSeparator


def make_int8_engine(model, variables, compute_dtype: str = "bfloat16"):
    """Build the int8 serving engine matching ``model``'s family.

    Raises NotImplementedError for families without an int8 engine
    (HDemucs serves through ``fold_quantized_weights``; HTDemucs gets the
    partial engine — int8 transformer + up/downsamplers, folded convs).
    """
    from fqss_tpu.models.convtasnet import ConvTasNet
    from fqss_tpu.models.convtasnet_music import ConvTasNetMusic
    from fqss_tpu.models.dptnet import DPTNet
    from fqss_tpu.models.htdemucs import HTDemucs
    from fqss_tpu.models.sepformer import Sepformer
    from fqss_tpu.serve.convtasnet_music_int8 import ConvTasNetMusicInt8Engine
    from fqss_tpu.serve.dptnet_int8 import DPTNetInt8Engine
    from fqss_tpu.serve.htdemucs_int8 import HTDemucsInt8Engine
    from fqss_tpu.serve.sepformer_int8 import SepformerInt8Engine

    for cls, engine_cls in (
        (ConvTasNet, ConvTasNetInt8Engine),
        (ConvTasNetMusic, ConvTasNetMusicInt8Engine),
        (Sepformer, SepformerInt8Engine),
        (DPTNet, DPTNetInt8Engine),
        (HTDemucs, HTDemucsInt8Engine),
    ):
        if isinstance(model, cls):
            return engine_cls(model, variables, compute_dtype=compute_dtype)
    raise NotImplementedError(
        f"no int8 engine for {type(model).__name__}; use fold_quantized_weights"
    )


__all__ = [
    "ConvTasNetInt8Engine",
    "StreamingSeparator",
    "auto_serving_model",
    "best_path",
    "fold_quantized_weights",
    "make_int8_engine",
]
