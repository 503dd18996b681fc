"""Continuous-batching serving engine over the quantized KV cache.

North-star capability with no reference counterpart (the reference asserts
batch size 1, deployment modeling_llama.py:1525, and drives single
sequences through HF generate()). Design:

  - a fixed pool of ``n_slots`` batch slots shares ONE batched KVCache;
    every decode step advances ALL slots in a single compiled program
    (per-sample positions in ops.deployed.decode_attention — each slot is
    an independent sequence at its own position).
  - requests queue on the host; a finished or empty slot is re-admitted by
    prefilling the new prompt into a 1-sequence cache and writing it into
    the slot's batch row (insertion cost is off the hot decode path).
  - sampling is host-side per-request (greedy / temperature), so requests
    with different sampling params share a step.

The scheduler is deliberately host-side Python: admission control and
retirement are control flow, not compute; the compute path stays one jit.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import engine
from .cache import KVCache, DeployConfig, DeployedQuant, create_cache
from .models.config import ModelConfig


@dataclass
class Request:
    rid: int
    prompt: np.ndarray  # (T,) int32
    max_new_tokens: int
    temperature: float = 0.0
    eos_token_id: int | None = None


@dataclass
class Completion:
    rid: int
    tokens: list = field(default_factory=list)


class Server:
    def __init__(self, params, cfg: ModelConfig, dcfg: DeployConfig,
                 dq: DeployedQuant, n_slots: int = 4, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.dcfg = dcfg
        self.dq = dq
        self.n = n_slots
        self.cache = create_cache(dcfg, cfg.n_layers, n_slots)
        self.queue: deque[Request] = deque()
        self.active: list[Request | None] = [None] * n_slots
        self.out: dict[int, Completion] = {}
        self.last_tok = np.zeros(n_slots, np.int32)
        self.pos = np.zeros(n_slots, np.int32)
        self.remaining = np.zeros(n_slots, np.int32)
        self._rng = np.random.default_rng(seed)
        self._last_logits = np.zeros((n_slots, cfg.vocab_size), np.float32)

        # the batched cache is donated: without donation every step pays a
        # full cache copy across the jit boundary (hundreds of MB at long
        # context)
        self._step = jax.jit(
            lambda p, d, c, tok, pos: engine.decode_step(
                p, cfg, dcfg, d, c, tok, pos
            ),
            donate_argnums=(2,),
        )
        self._prefill = jax.jit(
            lambda p, d, c, t: engine.prefill(p, cfg, dcfg, d, c, t)
        )

    # ------------------------------------------------------------------
    def submit(self, req: Request):
        self.queue.append(req)
        self.out[req.rid] = Completion(req.rid)

    def _write_slot(self, b: int, one_cache: KVCache):
        # INVARIANT: this must overwrite EVERY KVCache field for slot b.
        # Retired / never-admitted slots keep decoding (step() runs the whole
        # batch through the jitted decode) and append junk at their frozen
        # position; correctness of re-admission depends on this jax.tree.map
        # covering all fields — it iterates the full pytree, so a newly added
        # KVCache field is automatically included.
        def put(full, one):
            if full.ndim == 1:  # length (B,)
                return full.at[b].set(one[0])
            return jax.lax.dynamic_update_slice_in_dim(full, one, b, axis=1)

        self.cache = jax.tree.map(put, self.cache, one_cache)

    def _admit(self):
        for b in range(self.n):
            if self.active[b] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            prompt = jnp.asarray(req.prompt, jnp.int32)[None]
            one = create_cache(self.dcfg, self.cfg.n_layers, 1)
            one, logits = self._prefill(self.params, self.dq, one, prompt)
            self._write_slot(b, one)
            self.active[b] = req
            self.pos[b] = len(req.prompt)
            self.remaining[b] = req.max_new_tokens
            tok = self._sample_with(req, np.asarray(logits[0]))
            self.out[req.rid].tokens.append(tok)
            self.last_tok[b] = tok
            self.remaining[b] -= 1
            self._maybe_retire(b, tok)

    def _sample_with(self, req: Request, logits: np.ndarray) -> int:
        if req.temperature <= 0.0:
            return int(np.argmax(logits))
        z = logits / req.temperature
        z = z - z.max()
        p = np.exp(z)
        p /= p.sum()
        return int(self._rng.choice(len(p), p=p))

    def _maybe_retire(self, b: int, tok: int):
        req = self.active[b]
        if req is None:
            return
        done = (
            self.remaining[b] <= 0
            or (req.eos_token_id is not None and tok == req.eos_token_id)
            or self.pos[b] + 1 >= self.dcfg.max_len
        )
        if done:
            self.active[b] = None

    # ------------------------------------------------------------------
    def step(self) -> bool:
        """Admit waiting requests and advance every active slot by one
        token. Returns True while any work remains."""
        self._admit()
        if all(a is None for a in self.active):
            return bool(self.queue)

        cache, logits = self._step(
            self.params, self.dq, self.cache,
            jnp.asarray(self.last_tok), jnp.asarray(self.pos),
        )
        self.cache = cache
        logits_np = np.asarray(logits)
        for b in range(self.n):
            if self.active[b] is None:
                continue
            self.pos[b] += 1
            tok = self._sample_with(self.active[b], logits_np[b])
            self.out[self.active[b].rid].tokens.append(tok)
            self.last_tok[b] = tok
            self.remaining[b] -= 1
            self._maybe_retire(b, tok)
        return bool(self.queue) or any(a is not None for a in self.active)

    def run(self, requests, max_steps: int = 10_000) -> dict[int, Completion]:
        for r in requests:
            self.submit(r)
        steps = 0
        while self.step():
            steps += 1
            assert steps < max_steps, "serving loop did not converge"
        return self.out
