from pgmpy_tpu.readwrite.bif import BIFReader, BIFWriter

_READERS = {"bif": BIFReader}
_WRITERS = {"bif": BIFWriter}


def _register():
    """Lazily register optional formats as they are implemented."""
    try:
        from pgmpy_tpu.readwrite.xmlbif import XMLBIFReader, XMLBIFWriter

        _READERS["xmlbif"] = XMLBIFReader
        _WRITERS["xmlbif"] = XMLBIFWriter
    except ImportError:
        pass
    try:
        from pgmpy_tpu.readwrite.net import NETReader, NETWriter

        _READERS["net"] = NETReader
        _WRITERS["net"] = NETWriter
    except ImportError:
        pass
    try:
        from pgmpy_tpu.readwrite.uai import UAIReader, UAIWriter

        _READERS["uai"] = UAIReader
        _WRITERS["uai"] = UAIWriter
    except ImportError:
        pass
    try:
        from pgmpy_tpu.readwrite.xdsl import XDSLReader, XDSLWriter

        _READERS["xdsl"] = XDSLReader
        _WRITERS["xdsl"] = XDSLWriter
    except ImportError:
        pass
    try:
        from pgmpy_tpu.readwrite.xbn import XBNReader, XBNWriter

        _READERS["xbn"] = XBNReader
        _WRITERS["xbn"] = XBNWriter
    except ImportError:
        pass
    try:
        from pgmpy_tpu.readwrite.pomdpx import PomdpXReader, PomdpXWriter

        _READERS["pomdpx"] = PomdpXReader
        _WRITERS["pomdpx"] = PomdpXWriter
    except ImportError:
        pass


_register()


def get_reader(filetype):
    try:
        return _READERS[filetype.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown file format: {filetype}. Supported: {sorted(_READERS)}"
        )


def get_writer(filetype):
    try:
        return _WRITERS[filetype.lower()]
    except KeyError:
        raise ValueError(
            f"Unknown file format: {filetype}. Supported: {sorted(_WRITERS)}"
        )


def __getattr__(name):
    # late-bound exports for formats implemented after import time
    for registry in (_READERS, _WRITERS):
        for cls in registry.values():
            if cls.__name__ == name:
                return cls
    raise AttributeError(name)
