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
    if c.get("model_type") == "dbrx":
        return _dbrx_config(c)
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


def _dbrx_config(c: dict):
    """DBRX config schema (quant/dbrx/.../configuration_dbrx.py): top-level
    d_model/n_heads/n_layers plus attn_config / ffn_config sub-dicts."""
    from .moe import MoEConfig

    attn = c.get("attn_config", {})
    ffn = c.get("ffn_config", {})
    d_model = c["d_model"]
    n_heads = c["n_heads"]
    return MoEConfig(
        vocab_size=c["vocab_size"],
        d_model=d_model,
        n_layers=c["n_layers"],
        n_heads=n_heads,
        n_kv_heads=attn.get("kv_n_heads", n_heads),
        d_head=d_model // n_heads,
        d_ff=ffn.get("ffn_hidden_size", 4 * d_model),
        rms_eps=1e-5,
        rope_theta=attn.get("rope_theta", 500000.0),
        max_seq_len=c.get("max_seq_len", 32768),
        tie_embeddings=c.get("tie_word_embeddings", False),
        n_experts=ffn.get("moe_num_experts", 16),
        top_k=ffn.get("moe_top_k", 4),
        ffn_mode="sparse",
        norm_type="layernorm",
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

    from .moe import MoEConfig

    if isinstance(cfg, MoEConfig):
        return _load_dbrx(get, cfg, dtype), cfg

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


def _load_dbrx(get, cfg, dtype):
    """DBRX-schema weights into the models.moe parameter pytree.

    Schema (reference quant/dbrx/.../modeling_dbrx.py):
      transformer.blocks.{i}.norm_attn_norm.attn.Wqkv.weight  (qkv_out, D)
      transformer.blocks.{i}.norm_attn_norm.attn.out_proj.weight  (D, H*Dh)
      transformer.blocks.{i}.norm_attn_norm.norm_{1,2}.weight  (LayerNorm)
      transformer.blocks.{i}.ffn.router.layer.weight  (E, D)
      transformer.blocks.{i}.ffn.experts.mlp.{w1,v1,w2}  (E*F, D) fused
        (:734-736; per-expert chunks act as x@w1.T / x@v1.T gate/up and
         intermediate@w2 down, :742-748)
      transformer.wte.weight / transformer.norm_f.weight / lm_head.weight
    """
    L, D, F, E = cfg.n_layers, cfg.d_model, cfg.d_ff, cfg.n_experts
    p = "transformer.blocks.{i}."

    def stack_t(fmt):
        return jnp.asarray(
            np.stack([np.asarray(get(fmt.format(i=i))).T for i in range(L)]),
            dtype,
        )

    def stack_norm(fmt):
        return jnp.asarray(
            np.stack([np.asarray(get(fmt.format(i=i))) for i in range(L)]),
            jnp.float32,
        )

    def stack_experts(name, down: bool):
        mats = []
        for i in range(L):
            m = np.asarray(get(p.format(i=i) + f"ffn.experts.mlp.{name}"))
            m = m.reshape(E, F, D)
            # gate/up act as x @ chunk.T -> ours (E, D, F); down acts as
            # intermediate @ chunk -> ours (E, F, D) as stored
            mats.append(m if down else m.transpose(0, 2, 1))
        return jnp.asarray(np.stack(mats), dtype)

    layers = dict(
        w_qkv=stack_t(p + "norm_attn_norm.attn.Wqkv.weight"),
        wo=stack_t(p + "norm_attn_norm.attn.out_proj.weight"),
        w_router=stack_t(p + "ffn.router.layer.weight"),
        w_gate=stack_experts("w1", down=False),
        w_up=stack_experts("v1", down=False),
        w_down=stack_experts("w2", down=True),
        ln_attn=stack_norm(p + "norm_attn_norm.norm_1.weight"),
        ln_mlp=stack_norm(p + "norm_attn_norm.norm_2.weight"),
    )
    params = dict(
        embed=jnp.asarray(get("transformer.wte.weight"), dtype),
        final_norm=jnp.asarray(get("transformer.norm_f.weight"), jnp.float32),
        layers=layers,
    )
    if not cfg.tie_embeddings:
        params["lm_head"] = jnp.asarray(
            np.asarray(get("lm_head.weight")).T, dtype
        )
    return params
