"""KV-cache checkpointing: persist and restore a packed quantized cache.

The reference has no inference-time cache persistence (SURVEY.md §5); for
million-token contexts re-prefilling a prompt is minutes of work, so
session checkpointing is a first-class capability here. The cache is a
pytree of dense arrays — an .npz round-trips it exactly (packed codes and
encoded outlier words are bit-exact integers/floats).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from .cache import KVCache, DeployConfig


def save_cache(path: str, cache: KVCache, dcfg: DeployConfig) -> None:
    def host(a):
        # int4 is a JAX/ml_dtypes dtype with no stable npz representation:
        # widen to int8 on disk (values are in [-8, 7], bit-exact roundtrip)
        if str(a.dtype) == "int4":
            a = a.astype(jnp.int8)
        return np.asarray(a)

    arrays = {
        f.name: host(getattr(cache, f.name))
        for f in dataclasses.fields(KVCache)
    }
    arrays["__dcfg__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(dcfg)).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_cache(path: str) -> tuple[KVCache, DeployConfig]:
    with np.load(path) as z:
        dcfg = DeployConfig(**json.loads(bytes(z["__dcfg__"]).decode()))
        arrays = {}
        for f in dataclasses.fields(KVCache):
            a = jnp.asarray(z[f.name])
            if (dcfg.codes == "int4"
                    and f.name in ("k_planes", "v_planes")):
                a = a.astype(dcfg.code_dtype)
            arrays[f.name] = a
        cache = KVCache(**arrays)
    return cache, dcfg
