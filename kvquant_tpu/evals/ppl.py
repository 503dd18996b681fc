"""Perplexity evaluation (the reference's end-to-end correctness oracle,
quant/llama_simquant.py:48-146: windowed next-token NLL, ppl = exp(mean))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import llama, get_forward


def perplexity(params, cfg, token_windows, simquant=None, forward_fn=None):
    """token_windows: (N, T) int32 array or iterable of (B, T) batches.
    Returns ppl over all next-token positions."""

    @jax.jit
    def window_nll(p, tokens, sq_arrays):
        sq = (
            None
            if sq_arrays is None
            else llama.SimQuantParams(arrays=sq_arrays, config=simquant.config)
        )
        logits, _ = (forward_fn or get_forward(cfg))(p, cfg, tokens, simquant=sq)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size

    if hasattr(token_windows, "shape"):
        token_windows = [token_windows[i : i + 1] for i in range(token_windows.shape[0])]

    total, count = 0.0, 0
    sq_arrays = None if simquant is None else simquant.arrays
    for tokens in token_windows:
        s, n = window_nll(params, tokens, sq_arrays)
        total += float(s)
        count += int(n)
    return float(jnp.exp(total / count))
