"""Matching heads, one per ``cfg.MODEL.NAME``.

Each head/model takes the uniform episode signature (see
``models/fsar.py:CLIPSPMModel`` docs) and returns a dict with at least
``"logits"`` shaped ``[1, n_query, way]`` — the same output contract as the
reference heads (e.g. reference: models/model_clipspm.py:140-144).
"""

from .clipspm import CLIPSPM
from .clipfsar import CLIPFSARModel
from .cpm2c import CPM2CModel
from .molo import MoLoModel
from .otam import OTAMModel
from .soap import SOAPModel
from .sten import STENModel
from .strm import STRMModel
from .ta2n import TA2NModel
from .trx import TRXModel

__all__ = ["CLIPSPM", "CLIPFSARModel", "CPM2CModel", "MoLoModel",
           "OTAMModel", "SOAPModel", "STENModel", "STRMModel", "TA2NModel",
           "TRXModel"]
