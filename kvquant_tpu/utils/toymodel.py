"""Trained-toy-model harness.

The environment has zero network egress (no wikitext-2, no Llama weights), so
the reference's ppl-as-correctness-oracle (SURVEY.md §4) is reproduced with a
synthetic bigram language: a Dirichlet-sparse transition matrix gives the
data real structure (known entropy floor), a small LLaMA is trained to near
that floor, and quantization quality is then measured as ppl deltas against
the fp16 model — the same protocol as the paper's wikitext tables, portable
to real checkpoints whenever they are available locally.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..models import ModelConfig, init_params
from ..fisher import clm_loss

TOY_CFG = ModelConfig(
    vocab_size=512, d_model=256, n_layers=4, n_heads=8, n_kv_heads=4,
    d_head=32, d_ff=512, max_seq_len=512,
)


class BigramLM:
    """Synthetic language with known next-token entropy."""

    def __init__(self, vocab_size: int, alpha: float = 0.05, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.trans = rng.dirichlet(
            np.full(vocab_size, alpha), size=vocab_size
        ).astype(np.float32)
        self.vocab_size = vocab_size

    @property
    def entropy(self) -> float:
        t = self.trans
        return float(-(t * np.log(t + 1e-12)).sum(1).mean())

    @property
    def ideal_ppl(self) -> float:
        return float(np.exp(self.entropy))

    def sample(self, n: int, seq_len: int, seed: int) -> jax.Array:
        r = np.random.default_rng(seed)
        out = np.empty((n, seq_len), np.int32)
        out[:, 0] = r.integers(0, self.vocab_size, n)
        u = r.random((seq_len, n, 1), np.float32)
        for t in range(1, seq_len):
            out[:, t] = (
                self.trans[out[:, t - 1]].cumsum(1) > u[t]
            ).argmax(1)
        return jnp.array(out)


def train_toy_model(
    cfg: ModelConfig = TOY_CFG,
    steps: int = 1200,
    batch: int = 16,
    seq_len: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Train a small LLaMA on the bigram language. Returns (params, lm)."""
    import optax

    lm = BigramLM(cfg.vocab_size, seed=seed)
    params = init_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, tokens):
        loss, g = jax.value_and_grad(clm_loss)(params, cfg, tokens)
        upd, state = opt.update(g, state)
        return optax.apply_updates(params, upd), state, loss

    loss = None
    for i in range(steps):
        params, state, loss = step(params, state, lm.sample(batch, seq_len, i))
    return params, lm, float(loss)


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    out = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return out


def save_toy_checkpoint(path: str, params, loss: float, seed: int):
    """npz checkpoint (slash-joined pytree paths) — same no-pickle policy as
    quant/artifacts.py."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path, __loss__=np.float32(loss), __seed__=np.int32(seed),
        **_flatten(params),
    )


def load_toy_checkpoint(path: str):
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if not k.startswith("__")}
        loss = float(z["__loss__"])
        seed = int(z["__seed__"])
    return _unflatten(flat), loss, seed


def cached_toy_model(path: str = "artifacts/toy_model.npz", **kw):
    """Train once, cache to disk (params + final loss); reload thereafter."""
    cfg = kw.pop("cfg", TOY_CFG)
    if os.path.exists(path):
        params, loss, seed = load_toy_checkpoint(path)
        return params, BigramLM(cfg.vocab_size, seed=seed), loss
    seed = kw.get("seed", 0)
    params, lm, loss = train_toy_model(cfg, **kw)
    save_toy_checkpoint(path, jax.tree.map(np.asarray, params), loss, seed)
    return params, lm, loss
