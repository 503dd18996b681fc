"""kvquant_tpu — TPU-native KV-cache-quantized LLM inference framework.

A from-scratch JAX/XLA/Pallas implementation of the KVQuant methodology
(per-channel pre-RoPE Key quantization, per-token Value quantization,
Fisher-weighted non-uniform codebooks, dense-and-sparse outlier
decomposition, capped outliers, attention-sink-aware fp16 retention),
re-designed for TPU hardware: static shapes everywhere, bit-plane packed
HBM-resident caches, fused Pallas dequant+RoPE attention kernels, and
tensor-sharded weights/caches over a `jax.sharding.Mesh`.

Reference behavior: SqueezeAILab/KVQuant (see SURVEY.md for file:line map).
"""

__version__ = "0.1.0"

# Lazy top-level conveniences: heavy submodules import on first attribute
# access so `import kvquant_tpu` stays cheap.
_SUBMODULES = (
    "cache", "engine", "serve", "cache_io", "data", "baseline_fp16",
    "models", "ops", "quant", "parallel", "evals", "fisher", "utils",
    "native",
)


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
