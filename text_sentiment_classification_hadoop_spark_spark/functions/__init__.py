"""Column-expression factories (pure functions Column -> Column).

Everything here compiles to native Catalyst expressions (whole-stage
codegen, no Python UDFs) so the hot path stays JVM-side.
"""

from .cleaning import clean_chain_a, clean_chain_b  # noqa: F401
from .tokenize import tokens_array, explode_tokens, token_count_quirk  # noqa: F401
from .hashing import portable_hash64, minhash_expr, shingles_expr  # noqa: F401
