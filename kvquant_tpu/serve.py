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
    the slot's batch row. admit_mode="chunked" (serving v2) spreads that
    prefill over server steps — ONE quantized-trajectory prompt chunk per
    step (engine.prefill_chunk) — so active slots keep decoding while a
    long prompt streams in (decode stall per admit = one chunk's worth of
    compute sharing the step, not a whole-prompt prefill).
  - ServerPool adds capacity classes: one Server per max_len class, so a
    32-token request doesn't reserve a 128K-token cache slot.
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
from .cache import (KVCache, DeployConfig, DeployedQuant, create_cache,
                    check_intn_codebook)
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


@dataclass
class _Admission:
    """In-flight chunked admission: a 1-sequence cache filled one prompt
    chunk per server step, so active slots never stall behind a whole
    prompt (decode stall per admit = the one chunk sharing its step)."""

    req: Request
    slot: int
    cache: KVCache
    toks: np.ndarray  # (1, S + n_chunks*chunk) padded prompt
    n_chunks: int
    ci: int = 0
    last_logits: np.ndarray | None = None


class Server:
    def __init__(self, params, cfg: ModelConfig, dcfg: DeployConfig,
                 dq: DeployedQuant, n_slots: int = 4, seed: int = 0,
                 admit_mode: str = "sync", admit_chunk: int = 256):
        self.params = params
        self.cfg = cfg
        self.dcfg = dcfg
        self.dq = dq
        self.n = n_slots
        self.admit_mode = admit_mode
        self.admit_chunk = admit_chunk
        check_intn_codebook(dcfg, dq)
        self.cache = create_cache(dcfg, cfg.n_layers, n_slots)
        self.queue: deque[Request] = deque()
        self.active: list[Request | None] = [None] * n_slots
        self.admitting: list[_Admission] = []
        self.out: dict[int, Completion] = {}
        self.last_tok = np.zeros(n_slots, np.int32)
        self.pos = np.zeros(n_slots, np.int32)
        self.remaining = np.zeros(n_slots, np.int32)
        self._rng = np.random.default_rng(seed)
        self._last_logits = np.zeros((n_slots, cfg.vocab_size), np.float32)
        self.decode_steps = 0  # telemetry: decode advanced this many steps

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
        self._chunk = jax.jit(
            lambda p, d, c, tok, pos0, sf: engine.prefill_chunk(
                p, cfg, dcfg, d, c, tok, pos0, sf
            ),
            static_argnums=(5,),
            donate_argnums=(2,),
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

    def _activate(self, b: int, req: Request, one: KVCache, logits):
        self._write_slot(b, one)
        self.active[b] = req
        self.pos[b] = len(req.prompt)
        self.remaining[b] = req.max_new_tokens
        tok = self._sample_with(req, np.asarray(logits))
        self.out[req.rid].tokens.append(tok)
        self.last_tok[b] = tok
        self.remaining[b] -= 1
        self._maybe_retire(b, tok)

    def _admit_sync(self):
        for b in range(self.n):
            if self.active[b] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            prompt = jnp.asarray(req.prompt, jnp.int32)[None]
            one = create_cache(self.dcfg, self.cfg.n_layers, 1)
            one, logits = self._prefill(self.params, self.dq, one, prompt)
            self._activate(b, req, one, logits[0])

    # -- chunked (non-blocking) admission ------------------------------
    def _start_admissions(self):
        busy = {a.slot for a in self.admitting}
        for b in range(self.n):
            if self.active[b] is not None or b in busy or not self.queue:
                continue
            req = self.queue.popleft()
            S, chunk = self.dcfg.sink, self.admit_chunk
            T0 = len(req.prompt)
            assert T0 > S, "prompt must extend beyond the sink prefix"
            n_chunks = -(-(T0 - S) // chunk)
            toks = np.zeros((1, S + n_chunks * chunk), np.int32)
            toks[0, :T0] = req.prompt
            self.admitting.append(_Admission(
                req=req, slot=b,
                cache=create_cache(self.dcfg, self.cfg.n_layers, 1),
                toks=toks, n_chunks=n_chunks,
            ))
            busy.add(b)

    def _step_admission(self, adm: _Admission) -> bool:
        """Run ONE prompt chunk; returns True when the admission finished."""
        S, chunk = self.dcfg.sink, self.admit_chunk
        ci = adm.ci
        if ci == 0:
            blk = jnp.asarray(adm.toks[:, : S + chunk])
            pos0, sf = jnp.int32(S), True
        else:
            a = S + ci * chunk
            blk = jnp.asarray(adm.toks[:, a : a + chunk])
            pos0, sf = jnp.int32(a), False
        adm.cache, logits = self._chunk(
            self.params, self.dq, adm.cache, blk, pos0, sf
        )
        adm.ci += 1
        if adm.ci < adm.n_chunks:
            return False
        T0 = len(adm.req.prompt)
        last = (T0 - 1) - (S + (adm.n_chunks - 1) * chunk) if adm.n_chunks > 1 \
            else T0 - 1
        adm.cache = dataclasses.replace(
            adm.cache, length=jnp.full_like(adm.cache.length, T0)
        )
        adm.last_logits = np.asarray(logits[0, last])
        return True

    def _admit_chunked(self):
        self._start_admissions()
        if not self.admitting:
            return
        # at most ONE chunk of ONE admission per server step: the decode
        # stall per step is bounded by a single chunk regardless of how
        # long the incoming prompt is
        adm = self.admitting[0]
        if self._step_admission(adm):
            self.admitting.pop(0)
            self._activate(adm.slot, adm.req, adm.cache, adm.last_logits)

    def _admit(self):
        if self.admit_mode == "sync":
            self._admit_sync()
        else:
            self._admit_chunked()

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
        """Admit (one prompt chunk max in chunked mode) and advance every
        active slot by one token. Returns True while any work remains."""
        self._admit()
        if all(a is None for a in self.active):
            return bool(self.queue) or bool(self.admitting)

        cache, logits = self._step(
            self.params, self.dq, self.cache,
            jnp.asarray(self.last_tok), jnp.asarray(self.pos),
        )
        self.cache = cache
        self.decode_steps += 1
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
        return (bool(self.queue) or bool(self.admitting)
                or any(a is not None for a in self.active))

    def run(self, requests, max_steps: int = 10_000) -> dict[int, Completion]:
        for r in requests:
            self.submit(r)
        steps = 0
        while self.step():
            steps += 1
            assert steps < max_steps, "serving loop did not converge"
        return self.out


class ServerPool:
    """Capacity-class routing: one Server per cache-capacity class so short
    requests don't reserve a ``max_len`` cache slot (v1 weakness: every
    slot preallocated the full context). Static shapes stay static — each
    class is its own batched cache/compiled program; routing picks the
    smallest class that fits prompt + max_new_tokens.

    ``classes``: {max_len: n_slots}. True in-cache paging (page tables in
    the kernels) is a future round; class pools capture most of the memory
    win with zero kernel changes.
    """

    def __init__(self, params, cfg: ModelConfig, dcfg: DeployConfig,
                 dq: DeployedQuant, classes: dict[int, int], seed: int = 0,
                 admit_mode: str = "chunked", admit_chunk: int = 256):
        self.servers: dict[int, Server] = {}
        for max_len, n_slots in sorted(classes.items()):
            d = dataclasses.replace(dcfg, max_len=max_len)
            self.servers[max_len] = Server(
                params, cfg, d, dq, n_slots=n_slots, seed=seed,
                admit_mode=admit_mode, admit_chunk=admit_chunk,
            )

    def _route(self, req: Request) -> Server:
        need = len(req.prompt) + req.max_new_tokens + 1
        for max_len, srv in self.servers.items():  # sorted ascending
            if need <= max_len:
                return srv
        raise ValueError(
            f"request {req.rid} needs {need} tokens; largest class is "
            f"{max(self.servers)}"
        )

    def submit(self, req: Request):
        self._route(req).submit(req)

    def run(self, requests, max_steps: int = 10_000) -> dict[int, Completion]:
        for r in requests:
            self.submit(r)
        out: dict[int, Completion] = {}
        steps = 0
        live = True
        while live:
            live = False
            for srv in self.servers.values():
                live |= srv.step()
            steps += 1
            assert steps < max_steps, "serving loop did not converge"
        for srv in self.servers.values():
            out.update(srv.out)
        return out

    def cache_bytes(self) -> int:
        from .cache import cache_bytes

        return sum(
            cache_bytes(s.dcfg, s.cfg.n_layers, s.n)["total"]
            for s in self.servers.values()
        )
