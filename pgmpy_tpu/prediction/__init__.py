from pgmpy_tpu.prediction.naive_adjustment import NaiveAdjustmentRegressor

__all__ = ["NaiveAdjustmentRegressor"]
