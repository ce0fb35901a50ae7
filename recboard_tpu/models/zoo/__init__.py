"""The model zoo. Each module mirrors one reference model directory
(SURVEY.md §2.4) re-designed TPU-first; registry for the generic runner."""

from typing import Dict, Type

from ..base import RecSysArch

REGISTRY: Dict[str, Type[RecSysArch]] = {}


def register(name: str):
    def deco(cls):
        REGISTRY[name] = cls
        cls.ZOO_NAME = name
        return cls

    return deco


from . import mf_bpr  # noqa: F401,E402
from . import sasrec  # noqa: F401,E402
from . import gru4rec  # noqa: F401,E402
from . import lightgcn  # noqa: F401,E402
from . import bert4rec  # noqa: F401,E402
from . import fmlp_rec  # noqa: F401,E402
from . import hstu  # noqa: F401,E402
from .hstu import HSTU  # noqa: F401,E402
from . import ctr  # noqa: F401,E402
from . import graph_cf  # noqa: F401,E402
from . import fpmc  # noqa: F401,E402
from .graph_cf import GCN, GTE, NGCF, SGL, SimGCL  # noqa: F401,E402
from .fpmc import FPMC  # noqa: F401,E402
from . import narm  # noqa: F401,E402
from . import bsarec  # noqa: F401,E402
from . import stosa  # noqa: F401,E402
from . import glint_ru  # noqa: F401,E402
from . import rum  # noqa: F401,E402
from .narm import NARM  # noqa: F401,E402
from .bsarec import BSARec  # noqa: F401,E402
from .stosa import STOSA  # noqa: F401,E402
from .glint_ru import GLINTRU  # noqa: F401,E402
from .rum import RUM  # noqa: F401,E402
from . import graph_cf2  # noqa: F401,E402
from .graph_cf2 import CAGCN, JGCF, AlphaRec, PairNormSGC, SimpleX, UltraGCN  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from .multimodal import BM3, FREEDOM, LATTICE, MGCN, MMGCN  # noqa: F401,E402
from . import tiger  # noqa: F401,E402
from .tiger import RQVAE, RQVAECoach, TIGER  # noqa: F401,E402
from . import lessr  # noqa: F401,E402
from . import sevo  # noqa: F401,E402
from .lessr import LESSR  # noqa: F401,E402
from .sevo import SEvo, SEvoCoach  # noqa: F401,E402
from . import unisrec  # noqa: F401,E402
from .unisrec import UniSRec  # noqa: F401,E402
from . import ccfrec  # noqa: F401,E402
from . import e4srec  # noqa: F401,E402
from .ccfrec import CCFRec  # noqa: F401,E402
from .e4srec import E4SRec  # noqa: F401,E402
from . import etegrec  # noqa: F401,E402
from .etegrec import ETEGRec, ETEGRecCoach  # noqa: F401,E402
from . import diger  # noqa: F401,E402
from .diger import DIGER, DIGERCoach  # noqa: F401,E402
from .fmlp_rec import FMLPRec  # noqa: F401,E402
from .ctr import DCN, DeepFM  # noqa: F401,E402
from . import neumf  # noqa: F401,E402
from . import stamp  # noqa: F401,E402
from . import caser  # noqa: F401,E402
from .bert4rec import BERT4Rec  # noqa: F401,E402
from .neumf import NeuMF  # noqa: F401,E402
from .stamp import STAMP  # noqa: F401,E402
from .caser import Caser  # noqa: F401,E402
from .mf_bpr import MFBPR  # noqa: F401,E402
from .sasrec import SASRec  # noqa: F401,E402
from .gru4rec import GRU4Rec  # noqa: F401,E402
from .lightgcn import LightGCN  # noqa: F401,E402
