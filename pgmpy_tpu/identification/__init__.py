from pgmpy_tpu.identification.base import BaseIdentification
from pgmpy_tpu.identification.adjustment import Adjustment
from pgmpy_tpu.identification.frontdoor import Frontdoor

__all__ = ["BaseIdentification", "Adjustment", "Frontdoor"]
