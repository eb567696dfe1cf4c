"""Cross-library I/O interop fixtures.

``tests/testdata/ref*.{xmlbif,net,xdsl}`` were written by the REFERENCE
pgmpy's writers from ``net*.bif`` (random networks saved by our BIF
writer, read back by the reference's BIF reader — already an interop
round-trip).  Our readers must reconstruct the same structure and CPDs,
proving file-level compatibility in both directions.
"""

import os

import numpy as np
import pytest

from pgmpy_tpu.readwrite import BIFReader, NETReader, XDSLReader, XMLBIFReader

HERE = os.path.join(os.path.dirname(__file__), "testdata")


def _base(i):
    return BIFReader(os.path.join(HERE, f"net{i}.bif")).get_model()


@pytest.mark.parametrize("i", [0, 1])
@pytest.mark.parametrize(
    "reader_cls,ext",
    [(XMLBIFReader, "xmlbif"), (NETReader, "net"), (XDSLReader, "xdsl")],
)
class TestReferenceWrittenFiles:
    def test_reads_reference_written_file(self, i, reader_cls, ext):
        base = _base(i)
        model = reader_cls(os.path.join(HERE, f"ref{i}.{ext}")).get_model()
        assert set(map(str, model.nodes())) == set(map(str, base.nodes()))
        assert {tuple(map(str, e)) for e in model.edges()} == {
            tuple(map(str, e)) for e in base.edges()
        }
        for node in base.nodes():
            want = np.asarray(base.get_cpds(str(node)).get_values(), dtype=float)
            got = np.asarray(model.get_cpds(str(node)).get_values(), dtype=float)
            assert want.shape == got.shape, node
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=str(node))
        model.check_model()
