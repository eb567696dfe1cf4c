from pgmpy_tpu.utils.state_name import StateNameMixin

__all__ = ["StateNameMixin"]
