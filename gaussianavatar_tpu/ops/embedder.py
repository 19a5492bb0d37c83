"""NeRF-style positional encoding (reference model/modules.py:644-700,756-801
Embedder/get_embedder — duplicated there; one implementation here). Exposed
through NetworkParams.pos_encoding/num_emb_freqs for POP-style variants that
encode the UV query coordinates."""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def get_embedder(
    multires: int,
    input_dims: int = 3,
    include_input: bool = True,
    log_sampling: bool = True,
) -> Tuple[Callable[[jax.Array], jax.Array], int]:
    """Returns (embed_fn, out_dim): x (..., d) -> (..., out_dim) with
    [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{m-1} x), cos(2^{m-1} x)]."""
    if multires <= 0:
        return (lambda x: x), input_dims

    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    else:
        freqs = jnp.linspace(2.0**0, 2.0 ** (multires - 1), multires)

    out_dim = input_dims * (2 * multires + (1 if include_input else 0))

    def embed(x: jax.Array) -> jax.Array:
        parts = [x] if include_input else []
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim
