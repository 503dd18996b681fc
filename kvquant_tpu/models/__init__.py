from .config import ModelConfig, LLAMA2_7B, TINY_LLAMA, TINY_GQA
from .llama import (
    init_params,
    forward,
    make_kv_probes,
    SimQuantParams,
    SimQuantArrays,
    SimQuantConfig,
    simquant_from_quantizers,
    rope_cos_sin,
    apply_rope,
    rotate_half,
    rms_norm,
)
from .hf_loader import load_hf_checkpoint, config_from_hf


def get_forward(cfg):
    """Model-family dispatch on the config type (the reference's
    parse_model / get_layers introspection, quant/kvquant/model_parse.py):
    one forward with an identical (logits, aux) contract per family."""
    from . import moe as _moe

    if isinstance(cfg, _moe.MoEConfig):
        return _moe.forward
    return forward
