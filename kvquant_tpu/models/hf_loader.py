"""Load HuggingFace LLaMA/Mistral checkpoints from a local directory into the
stacked-parameter pytree used by kvquant_tpu.models.llama.

Zero-egress friendly: only reads local files (model.safetensors or a sharded
*.safetensors.index.json). The reference loads via transformers
from_pretrained inside three vendored forks; here the mapping is explicit and
~100 lines.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from .config import ModelConfig


def config_from_hf(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        c = json.load(f)
    rope_scaling = 1.0
    if isinstance(c.get("rope_scaling"), dict):
        rope_scaling = float(c["rope_scaling"].get("factor", 1.0))
    return ModelConfig(
        vocab_size=c["vocab_size"],
        d_model=c["hidden_size"],
        n_layers=c["num_hidden_layers"],
        n_heads=c["num_attention_heads"],
        n_kv_heads=c.get("num_key_value_heads", c["num_attention_heads"]),
        d_head=c["hidden_size"] // c["num_attention_heads"],
        d_ff=c["intermediate_size"],
        rms_eps=c.get("rms_norm_eps", 1e-5),
        rope_theta=c.get("rope_theta", 10000.0),
        rope_scaling=rope_scaling,
        max_seq_len=c.get("max_position_embeddings", 4096),
        tie_embeddings=c.get("tie_word_embeddings", False),
        sliding_window=c.get("sliding_window", None),
    )


def _open_shards(path: str):
    from safetensors import safe_open

    idx = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        shards = {
            s: safe_open(os.path.join(path, s), framework="np")
            for s in sorted(set(weight_map.values()))
        }
        return lambda name: shards[weight_map[name]].get_tensor(name)
    single = os.path.join(path, "model.safetensors")
    f = safe_open(single, framework="np")
    return f.get_tensor


def load_hf_checkpoint(path: str, dtype=jnp.bfloat16, max_seq_len=None):
    """Returns (params, cfg). Set ``max_seq_len`` beyond the pretraining
    window to apply linear RoPE scaling (quant/llama_simquant.py:35-38)."""
    cfg = config_from_hf(path)
    if max_seq_len is not None and max_seq_len > cfg.max_seq_len:
        cfg = cfg.scaled(max_seq_len)
    get = _open_shards(path)

    def w(name):
        # HF nn.Linear stores (out, in); our convention is (in, out)
        return np.asarray(get(name)).T

    def stack(fmt, transpose=True):
        mats = []
        for i in range(cfg.n_layers):
            t = np.asarray(get(fmt.format(i=i)))
            mats.append(t.T if transpose else t)
        return jnp.asarray(np.stack(mats), dtype)

    p = "model.layers.{i}."
    layers = dict(
        wq=stack(p + "self_attn.q_proj.weight"),
        wk=stack(p + "self_attn.k_proj.weight"),
        wv=stack(p + "self_attn.v_proj.weight"),
        wo=stack(p + "self_attn.o_proj.weight"),
        w_gate=stack(p + "mlp.gate_proj.weight"),
        w_up=stack(p + "mlp.up_proj.weight"),
        w_down=stack(p + "mlp.down_proj.weight"),
        ln_attn=jnp.asarray(
            np.stack(
                [get(p.format(i=i) + "input_layernorm.weight") for i in range(cfg.n_layers)]
            ),
            jnp.float32,
        ),
        ln_mlp=jnp.asarray(
            np.stack(
                [
                    get(p.format(i=i) + "post_attention_layernorm.weight")
                    for i in range(cfg.n_layers)
                ]
            ),
            jnp.float32,
        ),
    )
    params = dict(
        embed=jnp.asarray(get("model.embed_tokens.weight"), dtype),
        final_norm=jnp.asarray(get("model.norm.weight"), jnp.float32),
        layers=layers,
    )
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(w("lm_head.weight"), dtype)
    return params, cfg
