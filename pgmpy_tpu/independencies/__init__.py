from pgmpy_tpu.independencies.independencies import (
    Independencies,
    IndependenceAssertion,
)

__all__ = ["Independencies", "IndependenceAssertion"]
