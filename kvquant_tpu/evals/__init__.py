from .ppl import perplexity
