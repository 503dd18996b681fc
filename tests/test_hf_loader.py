"""LLaMA/Mistral checkpoint seam (models/hf_loader.py:91-148).

The only path from real pretrained checkpoints into this framework —
counterpart of the reference's from_pretrained loads
(deployment/llama.py:186-198). Zero egress forbids downloading a real
model, so these tests write a synthetic HF-format checkpoint (safetensors,
GQA, rope_theta / rope_scaling / sliding_window) and assert the loaded
pytree is numerically the transposed raw tensors and that the forward
matches a reference computation from those raw tensors — the same
round-trip protocol test_moe.py uses for the DBRX branch.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _write_llama_ckpt(tmp_path, rng, *, sharded=False, tie=False,
                      rope_scaling=None, sliding_window=None):
    from safetensors.numpy import save_file

    D, H, Hkv, L, F, V = 64, 8, 2, 3, 160, 512
    Dh = D // H
    cfgj = {
        "model_type": "llama",
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": H, "num_key_value_heads": Hkv,
        "intermediate_size": F, "rms_norm_eps": 1e-6,
        "rope_theta": 123456.0, "max_position_embeddings": 2048,
        "tie_word_embeddings": tie,
    }
    if rope_scaling is not None:
        cfgj["rope_scaling"] = {"type": "linear", "factor": rope_scaling}
    if sliding_window is not None:
        cfgj["sliding_window"] = sliding_window
    (tmp_path / "config.json").write_text(json.dumps(cfgj))

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": r(V, D),
        "model.norm.weight": np.abs(r(D)) + 0.5,
    }
    if not tie:
        tensors["lm_head.weight"] = r(V, D)
    for i in range(L):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = r(H * Dh, D)
        tensors[p + "self_attn.k_proj.weight"] = r(Hkv * Dh, D)
        tensors[p + "self_attn.v_proj.weight"] = r(Hkv * Dh, D)
        tensors[p + "self_attn.o_proj.weight"] = r(D, H * Dh)
        tensors[p + "mlp.gate_proj.weight"] = r(F, D)
        tensors[p + "mlp.up_proj.weight"] = r(F, D)
        tensors[p + "mlp.down_proj.weight"] = r(D, F)
        tensors[p + "input_layernorm.weight"] = np.abs(r(D)) + 0.5
        tensors[p + "post_attention_layernorm.weight"] = np.abs(r(D)) + 0.5

    if sharded:
        names = sorted(tensors)
        half = len(names) // 2
        shards = {
            "model-00001-of-00002.safetensors": {
                n: tensors[n] for n in names[:half]
            },
            "model-00002-of-00002.safetensors": {
                n: tensors[n] for n in names[half:]
            },
        }
        weight_map = {n: s for s, d in shards.items() for n in d}
        for fname, d in shards.items():
            save_file(d, str(tmp_path / fname))
        (tmp_path / "model.safetensors.index.json").write_text(
            json.dumps({"weight_map": weight_map})
        )
    else:
        save_file(tensors, str(tmp_path / "model.safetensors"))
    return tensors, cfgj


def test_llama_loader_roundtrip(tmp_path):
    """GQA + rope_scaling + sliding_window config mapping, weight
    transposition, and forward equivalence vs raw-tensor math."""
    from kvquant_tpu.models.hf_loader import load_hf_checkpoint
    from kvquant_tpu.models import llama

    rng = np.random.default_rng(11)
    tensors, cfgj = _write_llama_ckpt(
        tmp_path, rng, rope_scaling=4.0, sliding_window=512
    )
    params, cfg = load_hf_checkpoint(str(tmp_path), dtype=jnp.float32)

    # config field mapping
    assert cfg.n_heads == 8 and cfg.n_kv_heads == 2  # GQA preserved
    assert cfg.d_head == 8 and cfg.d_ff == 160
    assert cfg.rope_theta == 123456.0
    assert cfg.rope_scaling == 4.0
    assert cfg.sliding_window == 512
    assert cfg.rms_eps == 1e-6
    assert not cfg.tie_embeddings and "lm_head" in params

    # every stacked weight is the transposed raw tensor
    lay = params["layers"]
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        np.testing.assert_array_equal(
            np.asarray(lay["wk"][i]), tensors[p + "self_attn.k_proj.weight"].T
        )
        np.testing.assert_array_equal(
            np.asarray(lay["w_down"][i]), tensors[p + "mlp.down_proj.weight"].T
        )
        np.testing.assert_array_equal(
            np.asarray(lay["ln_attn"][i]), tensors[p + "input_layernorm.weight"]
        )
    np.testing.assert_array_equal(
        np.asarray(params["embed"]), tensors["model.embed_tokens.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]), tensors["lm_head.weight"].T
    )

    # layer-0 K projection against raw-tensor math (post-norm hidden state)
    x = (rng.standard_normal((1, 5, 64)) * 0.3).astype(np.float32)
    w = np.asarray(lay["ln_attn"][0])
    h = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + cfg.rms_eps) * w
    want_k = h @ tensors["model.layers.0.self_attn.k_proj.weight"].T
    got_k = np.asarray(h @ np.asarray(lay["wk"][0]))
    np.testing.assert_allclose(got_k, want_k, atol=1e-5)

    # end-to-end forward runs under GQA + sliding window and captures
    # pre-RoPE activations with the loaded shapes
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 16)), jnp.int32)
    logits, aux = llama.forward(params, cfg, toks, capture_kv=True)
    assert logits.shape == (1, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert aux["k_acts"].shape == (cfg.n_layers, 1, 16, cfg.kv_hidden)


def test_llama_loader_sharded_equals_single(tmp_path):
    """The *.safetensors.index.json shard path loads bit-identically to the
    single-file path."""
    from kvquant_tpu.models.hf_loader import load_hf_checkpoint

    d1 = tmp_path / "single"
    d2 = tmp_path / "sharded"
    d1.mkdir(); d2.mkdir()
    _write_llama_ckpt(d1, np.random.default_rng(3))
    _write_llama_ckpt(d2, np.random.default_rng(3), sharded=True)
    p1, c1 = load_hf_checkpoint(str(d1), dtype=jnp.float32)
    p2, c2 = load_hf_checkpoint(str(d2), dtype=jnp.float32)
    assert c1 == c2
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p1, p2,
    )


def test_llama_loader_tied_embeddings_and_rope_extension(tmp_path):
    """tie_word_embeddings drops lm_head; max_seq_len beyond the
    pretraining window applies linear RoPE scaling
    (quant/llama_simquant.py:35-38)."""
    from kvquant_tpu.models.hf_loader import load_hf_checkpoint

    _write_llama_ckpt(tmp_path, np.random.default_rng(5), tie=True)
    params, cfg = load_hf_checkpoint(
        str(tmp_path), dtype=jnp.float32, max_seq_len=8192
    )
    assert "lm_head" not in params and cfg.tie_embeddings
    # pretraining window 2048 -> 8192 is a 4x linear scale
    assert cfg.max_seq_len == 8192
    assert cfg.rope_scaling == pytest.approx(4.0)
