"""Paged quantized KV cache: a page POOL + per-slot page tables consumed
directly by the flash kernel's scalar-prefetch index maps.

Serving memory story (no reference counterpart — the reference is batch-1,
deployment modeling_llama.py:1525): slot-pool serving reserves
``n_slots * max_len`` tokens of cache even when most requests are short.
Here the packed cache is a pool of PAGE_TOKENS-token pages shared by all
slots; a slot holds a page-table row, and HBM is consumed proportional to
tokens actually cached. Retired slots return their pages to the free list.

TPU-native mechanism: the flash kernel already selects its token block
through an index map fed by scalar-prefetch operands (the layer index and
per-sample positions). Paging adds ONE more scalar-prefetch operand — the
(B, pages_per_slot) page table — and the token-block grid index goes
through ``table[b, t]`` before addressing the pool. The kernel BODY is
unchanged (ops/pallas/flash_decode._flash_kernel); dead-page clamping
composes with the lookup (the grid index is clamped to the last live page
BEFORE the table lookup, so dead pages re-request the previous page's DMA
and cost nothing — decode cost tracks each slot's filled prefix exactly as
in the contiguous layout).

Pages are cross-layer: pool arrays carry (L, NP, ...) and page ``i`` holds
the same token range in every layer (allocation granularity = PAGE_TOKENS
tokens of the whole model's cache — coarser than vLLM's per-layer pages,
but the table stays one small int32 array and the kernel one lookup).

Layout per storage mode (mirrors cache.py with the batch axis replaced by
the page axis):
  nuq : k/v_planes (L, NP, Hkv, bits, PAGE//32, D) int32
  intN: k/v_planes (L, NP, Hkv, PAGE, D) int4/int8
  kv_out (L, NP, n_groups, J, PAGE) fp32 ; v_scale/offset (L, NP, PAGE)
  sinks stay per-slot: (L, B, Hkv, S, D) fp32 (tiny)
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .cache import DeployConfig, DeployedQuant
from .models.config import ModelConfig

PAGE_TOKENS = 1024  # default page size (DeployConfig.page_tokens)


@jax.tree_util.register_dataclass
@dataclass
class PagedPool:
    k_planes: Any
    v_planes: Any
    kv_out: Any
    v_scale: Any
    v_offset: Any
    k_sink: Any
    v_sink: Any


def create_paged_pool(dcfg: DeployConfig, n_layers: int, n_pages: int,
                      n_slots: int) -> PagedPool:
    L, NP, B = n_layers, n_pages, n_slots
    H, D, S = dcfg.n_kv_heads, dcfg.d_head, dcfg.sink
    P = dcfg.page_tokens

    def z(shape, dt):
        return jnp.zeros(shape, dt)

    if dcfg.codes == "nuq":
        planes = lambda: z((L, NP, H, dcfg.bits, P // 32, D), jnp.int32)
    else:
        Hc = H // 2 if dcfg.codes == "int4x2" else H
        planes = lambda: z((L, NP, Hc, P, D), dcfg.code_dtype)
    return PagedPool(
        k_planes=planes(),
        v_planes=planes(),
        kv_out=z((L, NP, dcfg.n_groups, dcfg.n_slots, P), jnp.float32),
        v_scale=z((L, NP, P), jnp.float32),
        v_offset=z((L, NP, P), jnp.float32),
        k_sink=z((L, B, H, S, D), jnp.float32),
        v_sink=z((L, B, H, S, D), jnp.float32),
    )


def paged_pool_bytes(dcfg: DeployConfig, n_layers: int, n_pages: int,
                     n_slots: int) -> int:
    pool = jax.eval_shape(
        lambda: create_paged_pool(dcfg, n_layers, n_pages, n_slots)
    )
    return sum(
        int(np_.size * np_.dtype.itemsize) for np_ in jax.tree.leaves(pool)
    )


# ---------------------------------------------------------------------------
# attention: the flash kernel addressed through the page table
# ---------------------------------------------------------------------------


def paged_flash_decode(
    q_rot,        # (B, Hkv, G, D) fp32 queries, roped at each slot's pos
    pool: PagedPool,
    page_table,   # (B, MP) int32 page ids; rows beyond a slot's live pages
                  # may hold anything (clamped before lookup)
    dq: DeployedQuant,  # FULL (L, ...) quantizer arrays
    li,           # scalar int32 layer index
    pos,          # (B,) int32 absolute position of this step's token
    dcfg: DeployConfig,
    mcfg: ModelConfig,
):
    """One decode step's attention over sink + paged packed cache for layer
    ``li``. Identical math to ops.pallas.flash_decode.flash_attention with
    Tq == 1 and BT == PAGE_TOKENS; the only difference is the page-table
    indirection in the BlockSpec index maps."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .ops.pallas.attention import _interpret
    from .ops.pallas.flash_decode import _flash_kernel, fold_affine

    B, Hkv, Q, D = q_rot.shape
    bits = dcfg.bits
    BT = dcfg.page_tokens
    MP = page_table.shape[1]
    S = dcfg.sink
    J = pool.kv_out.shape[-2]
    sparse = bool(dcfg.include_sparse)
    K = 2 ** bits
    hg = dcfg.head_group

    k_range = dq.k_range.astype(jnp.float32)
    k_offset = dq.k_offset.astype(jnp.float32)
    k_lut = dq.k_lut_dec.astype(jnp.float32)
    v_lut = dq.v_lut_dec.astype(jnp.float32)
    L = pool.k_planes.shape[0]
    if dcfg.codes != "nuq":
        k_range, k_offset, vab = fold_affine(
            dcfg, k_lut, v_lut, k_range, k_offset
        )
    else:
        vab = jnp.zeros((L, 2), jnp.float32)
    li = jnp.asarray(li, jnp.int32)

    if sparse and dcfg.k_outliers == "channels":
        from .cache import k_channel_onehot

        k_sel = k_channel_onehot(dq.k_ressc, dcfg)  # (L, G, n_kc, hg*D)
        nsel = k_sel.shape[2]
        k_sel_rows = (
            k_sel.reshape(L, Hkv // hg, nsel, hg, D)
            .transpose(0, 1, 3, 2, 4)
            .reshape(L, Hkv, nsel, D)
        )
    else:
        nsel = 0
        k_sel_rows = None

    # per-call constants operand (B, Hkv, RH, D) — one row BAND per head,
    # same layout as flash_attention (six inputs; sub-tile row slices of a
    # flat block trigger per-read relayouts — see ops/pallas/flash_decode)
    def bcast_h(a):
        return jnp.broadcast_to(a[None], (B,) + a.shape)

    parts = [q_rot.astype(jnp.float32)]
    parts.append(bcast_h(jax.lax.dynamic_index_in_dim(
        k_range, li, 0, keepdims=False)[:, None]))
    parts.append(bcast_h(jax.lax.dynamic_index_in_dim(
        k_offset, li, 0, keepdims=False)[:, None]))
    if S > 0:
        parts.append(jax.lax.dynamic_index_in_dim(
            pool.k_sink.astype(jnp.float32), li, 0, keepdims=False))
        parts.append(jax.lax.dynamic_index_in_dim(
            pool.v_sink.astype(jnp.float32), li, 0, keepdims=False))
    if nsel:
        parts.append(bcast_h(jax.lax.dynamic_index_in_dim(
            k_sel_rows, li, 0, keepdims=False)))
    n_lr = -(-K // D)

    def lut_chunks(lut):
        padded = jnp.pad(lut, ((0, 0), (0, n_lr * D - K)))
        return padded.reshape(L, n_lr, D)

    lut_rows = jnp.concatenate(
        [lut_chunks(k_lut), lut_chunks(v_lut),
         jnp.pad(vab, ((0, 0), (0, D - 2)))[:, None, :]],
        axis=1,
    )
    lut_l = jax.lax.dynamic_index_in_dim(lut_rows, li, 0, keepdims=False)
    parts.append(jnp.broadcast_to(
        lut_l[None, None], (B, Hkv) + lut_l.shape
    ))
    cst = jnp.concatenate(parts, axis=2)
    RH = cst.shape[2]

    kern = functools.partial(
        _flash_kernel, bits=bits, D=D, BT=BT, S=S, Q=Q, Tq=1, Hkv=Hkv,
        theta=mcfg.rope_theta, scaling=mcfg.rope_scaling,
        window=mcfg.sliding_window, sparse=sparse, spk=dcfg.slots_per_kind,
        J=J, dot_bf16=dcfg.dot_bf16, nt=MP, hg=hg, codes=dcfg.codes,
        post_k=dcfg.post_rope_k, n_live=2 * dcfg.cap_per_side,
        k_mode=dcfg.k_outliers, n_live_v=2 * dcfg.cap_per_side, nsel=nsel,
    )
    grid = (B, MP, Hkv // hg)

    def im(f):
        return lambda b, t, g, li_r, pos_r, pt_r: f(li_r[0], b, t, g)

    def imp(f):
        # token-block index -> page id: clamp to the slot's last LIVE page
        # first (dead pages repeat the previous index -> no DMA), then look
        # the grid index up in the slot's page-table row
        def index(b, t, g, li_r, pos_r, pt_r):
            last_live = jnp.maximum((pos_r[b] - S) // BT, 0)
            return f(li_r[0], pt_r[b, jnp.minimum(t, last_live)], g)
        return index

    if dcfg.codes == "nuq":
        code_spec = lambda: pl.BlockSpec(
            (1, 1, hg, bits, BT // 32, D),
            imp(lambda li_, p, g: (li_, p, g, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        )
    elif dcfg.codes == "int4x2":
        assert hg % 2 == 0, "int4x2 flash kernel pairs heads within a group"
        code_spec = lambda: pl.BlockSpec(
            (1, 1, hg // 2, BT, D),
            imp(lambda li_, p, g: (li_, p, g, 0, 0)),
            memory_space=pltpu.VMEM,
        )
    else:
        code_spec = lambda: pl.BlockSpec(
            (1, 1, hg, BT, D),
            imp(lambda li_, p, g: (li_, p, g, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hkv, RH, D),
                         (lambda b, t, g, li_r, pos_r, pt_r: (b, 0, 0, 0)),
                         memory_space=pltpu.VMEM),
            code_spec(),
            code_spec(),
            pl.BlockSpec((1, 1, 1, J, BT),
                         imp(lambda li_, p, g: (li_, p, g, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT),
                         imp(lambda li_, p, g: (li_, p, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BT),
                         imp(lambda li_, p, g: (li_, p, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Hkv, Q, D), im(lambda li_, b, t, g: (b, 0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, Q, 128), jnp.float32),
            pltpu.VMEM((Hkv, Q, 128), jnp.float32),
            # cos/sin tiles: unused under post-RoPE storage — minimal
            # allocation there frees ~2*BT*D*4 bytes of VMEM for bigger
            # token blocks
            pltpu.VMEM(
                (2, 8 if dcfg.post_rope_k else BT, D), jnp.float32
            ),
            pltpu.VMEM((Q, BT), jnp.float32),
        ],
    )

    wrapped = lambda li_ref, pos_ref, pt_ref, *refs: kern(li_ref, pos_ref, *refs)
    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Q, D), jnp.float32),
        interpret=_interpret(),
    )(
        jnp.reshape(li, (1,)),
        jnp.asarray(pos, jnp.int32).reshape(B),
        jnp.asarray(page_table, jnp.int32),
        cst,
        pool.k_planes,
        pool.v_planes,
        pool.kv_out,
        pool.v_scale.astype(jnp.float32)[:, :, None, :],
        pool.v_offset.astype(jnp.float32)[:, :, None, :],
    )


# ---------------------------------------------------------------------------
# append + page-granular writes
# ---------------------------------------------------------------------------


def paged_append_token(
    pool: PagedPool,
    page_table,  # (B, MP) int32
    lq: DeployedQuant,  # layer-sliced quantizer
    dcfg: DeployConfig,
    mcfg: ModelConfig,
    k_new,  # (B, C)
    v_new,  # (B, C)
    pos,  # (B,) int32 absolute positions
    li,  # traced scalar layer index
    active=None,  # (B,) bool; False slots write nothing
) -> PagedPool:
    """Append one token per slot at layer ``li``: packed position p maps to
    (page_table[b, p // PAGE], p % PAGE). Row-level predicated writes, as
    append_token_flash. ``active`` (B,) bool: slots that are False write
    NOTHING — unlike the contiguous slot pool (where a retired slot's junk
    writes land in its own reserved rows), a paged slot's table row may
    alias pages that now belong to another request."""
    from .models.llama import rope_cos_sin, rotate_half
    from .ops.deployed import quantize_k, quantize_v

    B = k_new.shape[0]
    S = dcfg.sink
    P = dcfg.page_tokens
    Hkv, Dh = dcfg.n_kv_heads, dcfg.d_head
    MP = page_table.shape[1]

    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    if active is None:
        active = jnp.ones((B,), bool)
    in_sink = (pos < S) & active
    not_sink = (pos >= S) & active
    p = jnp.maximum(pos - S, 0)
    page_of = jnp.take_along_axis(
        jnp.asarray(page_table, jnp.int32),
        jnp.clip(p // P, 0, MP - 1)[:, None], axis=1,
    )[:, 0]  # (B,)
    row = p % P

    cos, sin = rope_cos_sin(pos, mcfg)
    k_h = k_new.reshape(B, Hkv, Dh).astype(jnp.float32)
    k_roped = k_h * cos[:, None] + rotate_half(k_h) * sin[:, None]
    k_store = k_roped.reshape(B, Hkv * Dh) if dcfg.post_rope_k else k_new
    codes_k, k_words = quantize_k(k_store, lq, dcfg)
    codes_v, v_words, v_sc, v_off = quantize_v(v_new, lq, dcfg)

    # pool arrays have no batch axis: each sample writes into ITS page.
    # Writes are sequential over samples rather than vmapped — two slots
    # never share a page row, so order is irrelevant. Every write is a
    # ROW-level read-modify-write (one word row / one intN row), exactly
    # like the contiguous append — no page ever copies.
    def put_planes(planes, codes):
        from .ops.packing import token_word_bit
        from .ops.deployed import _encode_rows

        bits = dcfg.bits

        def one(i, pl_):
            if dcfg.codes == "nuq":
                H_ = pl_.shape[2]
                w, jbit = token_word_bit(row[i])
                jbit = jnp.asarray(jbit, jnp.uint32)
                old = jax.lax.dynamic_slice(
                    pl_, (li, page_of[i], 0, 0, w, 0),
                    (1, 1, H_, bits, 1, pl_.shape[-1]),
                )
                rowdata = old.astype(jnp.uint32)
                shifts = jnp.arange(bits, dtype=jnp.uint32).reshape(
                    1, 1, 1, bits, 1, 1
                )
                bitvals = (
                    (codes[i].astype(jnp.uint32)[None, None, :, None, None, :]
                     >> shifts) & 1
                ) << jbit
                new = ((rowdata & ~(jnp.uint32(1) << jbit)) | bitvals).astype(
                    pl_.dtype
                )
                new = jnp.where(not_sink[i], new, old)
                return jax.lax.dynamic_update_slice(
                    pl_, new, (li, page_of[i], 0, 0, w, 0)
                )
            old = jax.lax.dynamic_slice(
                pl_, (li, page_of[i], 0, row[i], 0),
                (1, 1, pl_.shape[2], 1, pl_.shape[4]),
            )
            new = _encode_rows(codes[i], dcfg)[None, None, :, None, :]
            new = jnp.where(not_sink[i], new, old)
            return jax.lax.dynamic_update_slice(
                pl_, new, (li, page_of[i], 0, row[i], 0)
            )

        out = planes
        for i in range(B):
            out = one(i, out)
        return out

    out = dataclasses.replace(
        pool,
        k_planes=put_planes(pool.k_planes, codes_k),
        v_planes=put_planes(pool.v_planes, codes_v),
    )

    if dcfg.include_sparse:
        spk = dcfg.slots_per_kind

        def put_out(arr, words, row0):
            n = words.shape[-1]
            Gp = arr.shape[2]
            o = arr
            for i in range(B):
                old = jax.lax.dynamic_slice(
                    o, (li, page_of[i], 0, row0, row[i]), (1, 1, Gp, n, 1)
                )
                new = jnp.where(
                    not_sink[i],
                    words[i][None, None, :, :, None].astype(o.dtype), old,
                )
                o = jax.lax.dynamic_update_slice(
                    o, new, (li, page_of[i], 0, row0, row[i])
                )
            return o

        kv = put_out(pool.kv_out, k_words, 0)
        if v_words is not None:
            kv = put_out(kv, v_words, spk)
        out = dataclasses.replace(out, kv_out=kv)

    def put_scalar(arr, val):
        o = arr
        for i in range(B):
            old = jax.lax.dynamic_slice(
                o, (li, page_of[i], row[i]), (1, 1, 1)
            )
            new = jnp.where(
                not_sink[i], val[i].reshape(1, 1, 1).astype(o.dtype), old
            )
            o = jax.lax.dynamic_update_slice(o, new, (li, page_of[i], row[i]))
        return o

    out = dataclasses.replace(
        out,
        v_scale=put_scalar(pool.v_scale, v_sc),
        v_offset=put_scalar(pool.v_offset, v_off),
    )

    if S > 0:
        v_h = v_new.reshape(B, Hkv, Dh).astype(jnp.float32)
        ps = jnp.clip(pos, 0, S - 1)

        def put_sink(arr, rows):
            def one(a_b, r_b, q_b, pr_b):  # a_b (L, Hkv, S, D)
                old = jax.lax.dynamic_slice(
                    a_b, (li, 0, q_b, 0), (1, Hkv, 1, Dh)
                )
                new = jnp.where(pr_b, r_b[None, :, None, :], old)
                return jax.lax.dynamic_update_slice(a_b, new, (li, 0, q_b, 0))

            return jax.vmap(one, in_axes=(1, 0, 0, 0), out_axes=1)(
                arr, rows, ps, in_sink
            )

        out = dataclasses.replace(
            out,
            k_sink=put_sink(pool.k_sink, k_roped),
            v_sink=put_sink(pool.v_sink, v_h),
        )
    return out


def write_pages_from_cache(pool: PagedPool, cache_l_arrays: dict,
                           page_ids, slot: int, dcfg: DeployConfig):
    """Copy a CONTIGUOUS 1-sequence cache (the existing prefill output,
    arrays with their (L, 1, ...) batch axis) into allocated pool pages —
    page-granular dynamic_update_slices. ``page_ids`` is a static-length
    int32 vector; pages beyond the prompt's length copy zero-padded tail
    (harmless: masked dead in attention)."""
    P = dcfg.page_tokens
    n = page_ids.shape[0]
    out = pool

    kp = cache_l_arrays["k_planes"]  # (L, 1, H, bits, Tc//32, D) | (L,1,H,Tc,D)
    vp = cache_l_arrays["v_planes"]

    def put_block(pool_arr, src, i, tok_axis, rows_per_page):
        start_src = [0] * src.ndim
        start_src[tok_axis] = i * rows_per_page
        sizes = list(src.shape)
        sizes[tok_axis] = rows_per_page
        blk = jax.lax.dynamic_slice(src, start_src, sizes)[:, 0]  # (L, ...)
        start_dst = [0] * pool_arr.ndim
        start_dst[1] = page_ids[i]
        return jax.lax.dynamic_update_slice(
            pool_arr, blk[:, None].astype(pool_arr.dtype), start_dst
        )

    for i in range(n):
        if dcfg.codes == "nuq":
            out = dataclasses.replace(
                out,
                k_planes=put_block(out.k_planes, kp, i, 4, P // 32),
                v_planes=put_block(out.v_planes, vp, i, 4, P // 32),
            )
        else:
            out = dataclasses.replace(
                out,
                k_planes=put_block(out.k_planes, kp, i, 3, P),
                v_planes=put_block(out.v_planes, vp, i, 3, P),
            )
        out = dataclasses.replace(
            out,
            kv_out=put_block(out.kv_out, cache_l_arrays["kv_out"], i, 4, P),
            v_scale=put_block(out.v_scale, cache_l_arrays["v_scale"], i, 2, P),
            v_offset=put_block(
                out.v_offset, cache_l_arrays["v_offset"], i, 2, P
            ),
        )

    # sinks: copy the sequence's sink rows into the slot's row
    ks = cache_l_arrays["k_sink"][:, 0]  # (L, Hkv, S, D)
    vs = cache_l_arrays["v_sink"][:, 0]
    out = dataclasses.replace(
        out,
        k_sink=jax.lax.dynamic_update_slice(
            out.k_sink, ks[:, None].astype(out.k_sink.dtype),
            (0, slot, 0, 0, 0),
        ),
        v_sink=jax.lax.dynamic_update_slice(
            out.v_sink, vs[:, None].astype(out.v_sink.dtype),
            (0, slot, 0, 0, 0),
        ),
    )
    return out


# ---------------------------------------------------------------------------
# full-model paged decode step
# ---------------------------------------------------------------------------


def paged_decode_step(
    params,
    cfg: ModelConfig,
    dcfg: DeployConfig,
    dq: DeployedQuant,
    pool: PagedPool,
    page_table,  # (B, MP) int32
    token,  # (B,) int32
    pos,  # (B,) int32 per-slot positions
    active=None,  # (B,) bool
):
    """One decode step over the paged pool: append at each slot's position
    and attend through its page table. The layer scan carries the pool
    arrays; the kernel addresses pages via the scalar-prefetched table.
    Returns (pool, logits (B, V) fp32)."""
    from .models import llama

    B = token.shape[0]
    H, Dh = cfg.n_heads, cfg.d_head
    Hkv = cfg.n_kv_heads
    G = H // Hkv

    posb = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    cos, sin = llama.rope_cos_sin(posb, cfg)

    x = jnp.take(params["embed"], token, axis=0)
    arrs = {f.name: getattr(pool, f.name) for f in dataclasses.fields(PagedPool)}

    def layer_fn(carry, scanned):
        x, arrs = carry
        lp, lq, li = scanned["p"], scanned["q"], scanned["i"]

        h = llama.norm(x, lp["ln_attn"], cfg)
        q = (h @ lp["wq"]).reshape(B, H, Dh)
        k = h @ lp["wk"]
        v = h @ lp["wv"]

        p_in = PagedPool(**arrs)
        p_out = paged_append_token(
            p_in, page_table, lq, dcfg, cfg, k, v, posb, li, active
        )
        arrs = {
            f.name: getattr(p_out, f.name)
            for f in dataclasses.fields(PagedPool)
        }

        q_h = q.reshape(B, Hkv, G, Dh).astype(jnp.float32)
        q_rot = q_h * cos[:, None, None] + (
            llama.rotate_half(q_h) * sin[:, None, None]
        )
        attn = paged_flash_decode(
            q_rot, p_out, page_table, dq, li, posb, dcfg, cfg
        )
        x = x + (attn.reshape(B, H * Dh).astype(x.dtype) @ lp["wo"])
        h = llama.norm(x, lp["ln_mlp"], cfg)
        x = x + (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]
        return (x, arrs), None

    scanned = {
        "p": params["layers"], "q": dq,
        "i": jnp.arange(cfg.n_layers, dtype=jnp.int32),
    }
    (x, arrs), _ = jax.lax.scan(layer_fn, (x, arrs), scanned)

    x = llama.norm(x, params["final_norm"], cfg)
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    logits = (x @ head).astype(jnp.float32)
    return PagedPool(**arrs), logits


# ---------------------------------------------------------------------------
# paged continuous-batching server
# ---------------------------------------------------------------------------


class PagedServer:
    """Serving v3: one page pool shared by all slots, HBM proportional to
    cached tokens. Admission fills a temporary contiguous 1-sequence cache
    — whole-prompt (admit_mode="sync") or ONE quantized-trajectory chunk
    per server step (admit_mode="chunked", the non-blocking default: active
    slots keep decoding while a long prompt streams in) — then copies it
    page-granularly into freshly allocated pages. Pages are reserved when
    the admission STARTS (a started admission can never deadlock waiting
    for pages) and returned to the free list at retirement.

    Host-side state: the free list, each slot's page-table row (int32
    numpy), positions, and budgets. The compute path is ONE jitted
    paged_decode_step over all slots.
    """

    def __init__(self, params, cfg, dcfg: DeployConfig, dq, n_pages: int,
                 n_slots: int, max_pages_per_slot: int, seed: int = 0,
                 admit_mode: str = "chunked", admit_chunk: int = 256,
                 burst: int = 32):
        from . import engine

        self.params, self.cfg, self.dcfg, self.dq = params, cfg, dcfg, dq
        self.n_slots = n_slots
        self.MP = max_pages_per_slot
        self.admit_mode = admit_mode
        self.admit_chunk = admit_chunk
        self.burst = burst  # max device-side scanned steps per host round
        #   trip (0 disables). One dispatch costs ~66 ms through the remote
        #   tunnel (and ~ms even directly attached) vs single-digit ms of
        #   step compute — run() amortizes it by scanning up to ``burst``
        #   greedy decode steps on device whenever no admission is pending.
        self.admitting = []
        self._chunk_fns = {}  # tmp cache_tokens -> jitted prefill_chunk
        self._burst_fns = {}  # H -> jitted H-step scanned decode
        assert admit_chunk % 128 == 0
        self.pool = create_paged_pool(dcfg, cfg.n_layers, n_pages, n_slots)
        self.free = list(range(n_pages))
        import numpy as _np

        self.table = _np.zeros((n_slots, self.MP), _np.int32)
        self.pos = _np.zeros((n_slots,), _np.int32)
        self.active = _np.zeros((n_slots,), bool)
        self.slot_req = [None] * n_slots
        self.slot_pages = [[] for _ in range(n_slots)]
        self.completions = {}
        self.queue = []
        self._engine = engine
        self._rng = _np.random.default_rng(seed)
        self._np = _np

        self._step = jax.jit(
            lambda pool, table, tok, pos, act: paged_decode_step(
                params, cfg, dcfg, dq, pool, table, tok, pos, act
            ),
            donate_argnums=(0,),
        )
        self._last_tok = _np.zeros((n_slots,), _np.int32)

    def submit(self, req):
        self.queue.append(req)

    def _pages_needed(self, req) -> int:
        t = len(req.prompt) + req.max_new_tokens - self.dcfg.sink
        return max(1, -(-t // self.dcfg.page_tokens))

    def _claim(self):
        """Pop the queue head if a slot AND its pages are available.
        Returns (req, slot, pages, tmp_dcfg) or None."""
        import dataclasses as _dc

        if not self.queue:
            return None
        busy = {a["slot"] for a in self.admitting}
        free_slots = [b for b in range(self.n_slots)
                      if not self.active[b] and b not in busy]
        if not free_slots:
            return None
        req = self.queue[0]
        need = self._pages_needed(req)
        assert need <= self.MP, (
            f"request {req.rid} needs {need} pages > per-slot max {self.MP}"
        )
        if need > len(self.free):
            return None
        self.queue.pop(0)
        b = free_slots[0]
        pages = [self.free.pop() for _ in range(need)]
        tmp_len = self.dcfg.sink + need * self.dcfg.page_tokens
        tmp_dcfg = _dc.replace(self.dcfg, max_len=tmp_len)
        assert tmp_dcfg.cache_tokens % self.dcfg.page_tokens == 0
        return req, b, pages, tmp_dcfg

    def _activate(self, req, b, pages, tmp_cache, logits_last):
        arrs = {
            f.name: getattr(tmp_cache, f.name)
            for f in dataclasses.fields(type(tmp_cache)) if f.name != "length"
        }
        self.pool = write_pages_from_cache(
            self.pool, arrs, jnp.asarray(pages, jnp.int32), b, self.dcfg
        )
        self.table[b, :len(pages)] = pages
        self.table[b, len(pages):] = pages[-1]  # clamp-safe padding
        self.pos[b] = len(req.prompt)
        self.active[b] = True
        self.slot_req[b] = req
        self.slot_pages[b] = pages
        from .serve import Completion

        self.completions[req.rid] = Completion(rid=req.rid)
        self._last_tok[b] = int(self._np.asarray(logits_last).argmax())

    def _admit_sync(self):
        from .cache import create_cache

        while True:
            claim = self._claim()
            if claim is None:
                return
            req, b, pages, tmp_dcfg = claim
            tmp = create_cache(tmp_dcfg, self.cfg.n_layers, 1)
            prompt = jnp.asarray(req.prompt, jnp.int32)[None]
            tmp, logits = self._engine.prefill(
                self.params, self.cfg, tmp_dcfg, self.dq, tmp, prompt
            )
            self._activate(req, b, pages, tmp, logits[0])

    # -- chunked (non-blocking) paged admission ------------------------
    def _start_admissions(self):
        from .cache import create_cache

        while True:
            claim = self._claim()
            if claim is None:
                return
            req, b, pages, tmp_dcfg = claim
            S, chunk = self.dcfg.sink, self.admit_chunk
            T0 = len(req.prompt)
            assert T0 > S, "prompt must extend beyond the sink prefix"
            n_chunks = -(-(T0 - S) // chunk)
            toks = self._np.zeros((1, S + n_chunks * chunk), self._np.int32)
            toks[0, :T0] = req.prompt
            self.admitting.append(dict(
                req=req, slot=b, pages=pages, tmp_dcfg=tmp_dcfg,
                cache=create_cache(tmp_dcfg, self.cfg.n_layers, 1),
                toks=toks, n_chunks=n_chunks, ci=0,
            ))

    def _chunk_fn(self, tmp_dcfg):
        key = tmp_dcfg.cache_tokens
        if key not in self._chunk_fns:
            self._chunk_fns[key] = jax.jit(
                lambda p, d, c, tok, pos0, sf: self._engine.prefill_chunk(
                    p, self.cfg, tmp_dcfg, d, c, tok, pos0, sf
                ),
                static_argnums=(5,),
                donate_argnums=(2,),
            )
        return self._chunk_fns[key]

    def _step_admission(self, adm) -> bool:
        """Run ONE quantized-trajectory prompt chunk; True when finished."""
        S, chunk = self.dcfg.sink, self.admit_chunk
        ci = adm["ci"]
        if ci == 0:
            blk = jnp.asarray(adm["toks"][:, : S + chunk])
            pos0, sf = jnp.int32(S), True
        else:
            a = S + ci * chunk
            blk = jnp.asarray(adm["toks"][:, a : a + chunk])
            pos0, sf = jnp.int32(a), False
        adm["cache"], logits = self._chunk_fn(adm["tmp_dcfg"])(
            self.params, self.dq, adm["cache"], blk, pos0, sf
        )
        adm["ci"] += 1
        if adm["ci"] < adm["n_chunks"]:
            return False
        T0 = len(adm["req"].prompt)
        last = (T0 - 1) - (S + (adm["n_chunks"] - 1) * chunk) \
            if adm["n_chunks"] > 1 else T0 - 1
        adm["last_logits"] = self._np.asarray(logits[0, last])
        return True

    def _admit_chunked(self):
        self._start_admissions()
        if not self.admitting:
            return
        # advance ONE admission per server step: decode stall per admit is
        # bounded by a single chunk's compute sharing the step
        adm = self.admitting[0]
        if self._step_admission(adm):
            self.admitting.pop(0)
            self._activate(adm["req"], adm["slot"], adm["pages"],
                           adm["cache"], adm["last_logits"])

    def _admit(self):
        if self.admit_mode == "chunked":
            self._admit_chunked()
        else:
            self._admit_sync()

    # -- device-side decode bursts --------------------------------------
    def _burst_fn(self, H: int):
        """Jitted H-step scanned decode: greedy sampling ON DEVICE, one
        host round trip for H tokens per slot. The page table and active
        mask are fixed for the whole burst (run() only bursts when no
        admission is pending), so retirements/admissions happen at burst
        boundaries. H is restricted to powers of two to bound compiles."""
        if H not in self._burst_fns:
            def burst(params, dq, pool, table, tok, pos, act):
                def body(carry, _):
                    pool, tok, pos = carry
                    pool, logits = paged_decode_step(
                        params, self.cfg, self.dcfg, dq,
                        pool, table, tok, pos, act,
                    )
                    nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    return (
                        pool,
                        jnp.where(act, nxt, tok),
                        jnp.where(act, pos + 1, pos),
                    ), tok  # emit the token APPENDED this step
                (pool, tok, pos), toks = jax.lax.scan(
                    body, (pool, tok, pos), None, length=H
                )
                return pool, tok, pos, toks
            self._burst_fns[H] = jax.jit(burst, donate_argnums=(2,))
        return self._burst_fns[H]

    def _step_burst(self) -> int:
        """Run one burst: H = largest power of two <= min remaining budget
        over active slots (so no slot overshoots its reserved pages),
        capped at ``self.burst``. Falls back to a single hosted step when
        no slot is active, H < 2, or any active request needs temperature
        sampling (host RNG). EOS inside a burst wastes the slot's tail
        steps (junk appends land in the slot's own reserved pages; the next
        occupant's admission overwrites them page-granularly) — the tokens
        are discarded here and the slot retires exactly as in step().
        Returns the number of decode steps executed (0 when idle)."""
        act_idx = [b for b in range(self.n_slots) if self.active[b]]
        if not act_idx:
            return 1 if self.step() else 0
        rem = min(
            self.slot_req[b].max_new_tokens
            - len(self.completions[self.slot_req[b].rid].tokens)
            for b in act_idx
        )
        if rem < 2 or any(
            self.slot_req[b].temperature != 0.0 for b in act_idx
        ):
            return 1 if self.step() else 0
        H = 1
        while H * 2 <= min(rem, self.burst):
            H *= 2
        self.pool, tok, pos, toks = self._burst_fn(H)(
            self.params, self.dq, self.pool,
            jnp.asarray(self.table), jnp.asarray(self._last_tok),
            jnp.asarray(self.pos), jnp.asarray(self.active),
        )
        toks = self._np.asarray(toks)  # (H, n_slots)
        self._last_tok = self._np.asarray(tok).astype(self._np.int32)
        self.pos = self._np.asarray(pos).astype(self._np.int32)
        for b in act_idx:
            req = self.slot_req[b]
            comp = self.completions[req.rid]
            done = False
            for h in range(H):
                t = int(toks[h, b])
                comp.tokens.append(t)
                if req.eos_token_id is not None and t == req.eos_token_id:
                    done = True
                    break
            if done or len(comp.tokens) >= req.max_new_tokens:
                self._retire(b)
        return H

    def _retire(self, b):
        for pg in self.slot_pages[b]:
            self.free.append(pg)
        self.slot_pages[b] = []
        self.table[b] = 0
        self.active[b] = False
        self.slot_req[b] = None

    def step(self) -> bool:
        self._admit()
        if not self.active.any() and not self.queue and not self.admitting:
            return False
        self.pool, logits = self._step(
            self.pool,
            jnp.asarray(self.table),
            jnp.asarray(self._last_tok),
            jnp.asarray(self.pos),
            jnp.asarray(self.active),
        )
        logits = self._np.asarray(logits)
        for b in range(self.n_slots):
            if not self.active[b]:
                continue
            req = self.slot_req[b]
            comp = self.completions[req.rid]
            tok = self._last_tok[b]  # token just appended at pos[b]
            comp.tokens.append(int(tok))
            self.pos[b] += 1
            if req.temperature == 0.0:
                nxt = int(logits[b].argmax())
            else:
                z = logits[b] / req.temperature
                z = z - z.max()
                p = self._np.exp(z)
                nxt = int(self._rng.choice(len(p), p=p / p.sum()))
            self._last_tok[b] = nxt
            done = len(comp.tokens) >= req.max_new_tokens
            if req.eos_token_id is not None and tok == req.eos_token_id:
                done = True
            if done:
                self._retire(b)
        return True

    def run(self, requests, max_steps: int = 10_000):
        """Drive until done or ``max_steps`` decode steps. A burst of H
        tokens counts as H steps, so max_steps bounds decode WORK, not
        host round trips."""
        for r in requests:
            self.submit(r)
        steps = 0
        while steps < max_steps:
            if self.burst > 1 and self.active.any() and not self.queue \
                    and not self.admitting:
                n = self._step_burst()
            else:
                n = 1 if self.step() else 0
            if n == 0:
                break
            steps += n
        return self.completions
