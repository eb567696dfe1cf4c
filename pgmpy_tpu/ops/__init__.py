from pgmpy_tpu.ops.einsum import make_axis_map, sum_product, sum_product_planned

__all__ = ["make_axis_map", "sum_product", "sum_product_planned"]
