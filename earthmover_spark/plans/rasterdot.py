"""Pure-stdlib DAG rasterizer — the last-resort PNG tier for
``render_png`` when neither graphviz ``dot`` nor matplotlib is
installed (this container ships neither).

Layered left-to-right layout (sources | transformations |
destinations), filled node boxes, a built-in 5x7 bitmap font for
labels, Bresenham edges with arrowheads — written straight through
``earthmover_spark.llm.png.encode_png``. The drawing is intentionally
plain: the point is that ``--show-graph`` always yields a legible
image, not typography.
"""

from __future__ import annotations

#: 5x7 bitmap font, one int per row (bit 4 = leftmost pixel).
#: Uppercase + digits + the chars node labels use; lowercase maps up.
_FONT = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    " ": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00),
}

_KIND_FILL = {
    "sources": (139, 211, 199),
    "transformations": (255, 238, 147),
    "destinations": (244, 165, 174),
}

_NODE_W, _NODE_H = 180, 46
_COL_GAP, _ROW_GAP = 110, 26
_MARGIN = 24


class _Canvas:
    def __init__(self, w: int, h: int):
        self.w, self.h = w, h
        self.px = [bytearray([255] * (w * 3)) for _ in range(h)]

    def set(self, x: int, y: int, rgb) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            row = self.px[y]
            row[3 * x:3 * x + 3] = bytes(rgb)

    def rect(self, x0, y0, x1, y1, fill, border=(0, 0, 0)):
        for y in range(y0, y1 + 1):
            for x in range(x0, x1 + 1):
                edge = y in (y0, y1) or x in (x0, x1)
                self.set(x, y, border if edge else fill)

    def line(self, x0, y0, x1, y1, rgb=(60, 60, 60)):
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.set(x0, y0, rgb)
            if x0 == x1 and y0 == y1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def text(self, x, y, s, rgb=(0, 0, 0)):
        for ch in s.upper():
            glyph = _FONT.get(ch, _FONT[" "])
            for ry, bits in enumerate(glyph):
                for rx in range(5):
                    if bits & (1 << (4 - rx)):
                        self.set(x + rx, y + ry, rgb)
            x += 6


def render_graph_png(
    nodes: dict,
    parents: dict,
    path: str,
    labels: dict | None = None,
) -> str:
    """``nodes`` maps name -> kind ('sources' | 'transformations' |
    'destinations'); ``parents`` maps name -> iterable of parent
    names; ``labels`` optionally overrides node text (e.g. with row
    counts). Writes a PNG and returns ``path``."""
    from earthmover_spark.llm.png import encode_png

    layer_of = {"sources": 0, "transformations": 1, "destinations": 2}
    cols: dict[int, list[str]] = {0: [], 1: [], 2: []}
    for name in sorted(nodes):
        cols[layer_of.get(nodes[name], 1)].append(name)
    n_rows = max((len(v) for v in cols.values()), default=1) or 1
    w = _MARGIN * 2 + 3 * _NODE_W + 2 * _COL_GAP
    h = _MARGIN * 2 + n_rows * _NODE_H + (n_rows - 1) * _ROW_GAP
    cv = _Canvas(w, h)
    pos: dict[str, tuple[int, int]] = {}
    for layer, names in cols.items():
        x0 = _MARGIN + layer * (_NODE_W + _COL_GAP)
        for i, name in enumerate(names):
            y0 = _MARGIN + i * (_NODE_H + _ROW_GAP)
            pos[name] = (x0, y0)
    # edges under nodes
    for name in sorted(nodes):
        for parent in parents.get(name, []):
            if parent not in pos:
                continue
            px, py = pos[parent]
            nx_, ny = pos[name]
            x0, y0 = px + _NODE_W, py + _NODE_H // 2
            x1, y1 = nx_, ny + _NODE_H // 2
            cv.line(x0, y0, x1, y1)
            cv.line(x1, y1, x1 - 5, y1 - 3)
            cv.line(x1, y1, x1 - 5, y1 + 3)
    for name, (x0, y0) in pos.items():
        fill = _KIND_FILL.get(nodes[name], (204, 204, 204))
        cv.rect(x0, y0, x0 + _NODE_W - 1, y0 + _NODE_H - 1, fill)
        text = (labels or {}).get(name, name)
        for li, linetext in enumerate(str(text).split("\n")[:3]):
            cv.text(x0 + 8, y0 + 8 + 12 * li, linetext[:28])
    png = encode_png(w, h, [bytes(r) for r in cv.px])
    with open(path, "wb") as fh:
        fh.write(png)
    return path
