"""Minimal table pretty-printer used by factor/CPD ``__str__``.

The reference vendors the full ``tabulate`` package
(``/root/reference/pgmpy/extern/tabulate.py``); here only the two formats the
library actually uses ("grid" and "fancy_grid") are implemented, from
scratch, since table rendering is cosmetic.
"""

_FORMATS = {
    "grid": dict(h="-", v="|", c="+", hh="="),
    "fancy_grid": dict(h="─", v="│", c="┼", hh="═"),
}


def _fmt_cell(x, floatfmt):
    if isinstance(x, float):
        return format(x, floatfmt)
    return str(x)


def tabulate(rows, headers=(), tablefmt="grid", floatfmt="g"):
    fmt = _FORMATS.get(tablefmt, _FORMATS["grid"])
    str_rows = [[_fmt_cell(c, floatfmt) for c in row] for row in rows]
    str_headers = [str(h) for h in headers]
    ncols = max([len(r) for r in str_rows] + [len(str_headers)] or [0])
    widths = [0] * ncols
    for row in [str_headers] + str_rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))

    def sep(char):
        return fmt["c"] + fmt["c"].join(char * (w + 2) for w in widths) + fmt["c"]

    def line(row):
        cells = [
            " " + (row[i] if i < len(row) else "").ljust(widths[i]) + " "
            for i in range(ncols)
        ]
        return fmt["v"] + fmt["v"].join(cells) + fmt["v"]

    out = [sep(fmt["h"])]
    if str_headers:
        out.append(line(str_headers))
        out.append(sep(fmt["hh"]))
    for row in str_rows:
        out.append(line(row))
        out.append(sep(fmt["h"]))
    return "\n".join(out)
