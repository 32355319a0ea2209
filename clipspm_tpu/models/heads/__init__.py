"""Matching heads, one per ``cfg.MODEL.NAME``.

Each head is a flax Module whose ``__call__`` takes episode features/images
plus (for CLIP heads) gathered text features and returns a dict with at least
``"logits"`` shaped ``[1, n_query, way]`` — the same output contract as the
reference heads (e.g. reference: models/model_clipspm.py:140-144).
"""

from .clipspm import CLIPSPM

__all__ = ["CLIPSPM"]
