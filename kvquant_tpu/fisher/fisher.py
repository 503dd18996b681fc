"""Fisher-information calibration.

The reference (gradients/run-fisher.py:209-306) forks transformers to wrap
k_proj/v_proj in LinearAct modules that retain activation grads, runs
forward+backward of the causal-LM loss per sample, and harvests
(dL/d a_kv)^2.

TPU-native formulation: the model forward takes zero-valued probe tensors
added to the k/v projection outputs (models/llama.py); d(loss)/d(probe) IS
d(loss)/d(activation), obtained with plain jax.grad — no module surgery, no
retained graph, and the whole thing jits/shards. The empirical Fisher of an
activation element is the squared gradient, accumulated per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import llama
from ..models.config import ModelConfig


def clm_loss(params, cfg: ModelConfig, tokens, kv_probes=None):
    """Mean next-token cross-entropy (labels = inputs shifted)."""
    from ..models import get_forward

    logits, _ = get_forward(cfg)(params, cfg, tokens, kv_probes=kv_probes)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def _fisher_step(params, cfg: ModelConfig, tokens):
    B, T = tokens.shape
    probes = llama.make_kv_probes(cfg, B, T)
    grads = jax.grad(
        lambda pr: clm_loss(params, cfg, tokens, kv_probes=pr)
    )(probes)
    # empirical Fisher: squared activation gradients (run-fisher.py:285-295)
    return grads["k"] ** 2, grads["v"] ** 2


def fisher_info(params, cfg: ModelConfig, batches, donate: bool = False):
    """Accumulate per-element Fisher info over calibration batches.

    batches: iterable of (B, T) int32 token arrays (same T).
    Returns (fisher_k, fisher_v): (L, N_tokens_total, C) fp32, token rows
    concatenated across batches in order — aligned with the activation rows
    captured by models.forward(capture_kv=True) over the same batches.
    """
    step = jax.jit(_fisher_step, static_argnames=("cfg",))
    ks, vs = [], []
    for tokens in batches:
        fk, fv = step(params, cfg, tokens)
        L = fk.shape[0]
        ks.append(fk.reshape(L, -1, fk.shape[-1]))
        vs.append(fv.reshape(L, -1, fv.shape[-1]))
    return jnp.concatenate(ks, axis=1), jnp.concatenate(vs, axis=1)
