"""Synthetic textbook PDF generator (test fixtures + benchmark inputs).

A minimal first-party PDF 1.4 writer — no external PDF libs exist in this
environment — that emits textbook-like pages: body paragraphs, figure
captions, vector charts (bar/line/pie), flowchart diagrams, and embedded
raster images, together with machine ground truth (visual bboxes, captions,
text blocks) for detection/OCR parity tests. The reference pipeline consumed
arbitrary textbooks via PyMuPDF (ref pdf_image_segmentation.py:2731); our
framework's ingest engine is validated against books produced here, where
exact geometry is known.

Coordinates in the public API are TOP-LEFT origin PDF points (matching the
reference's fitz geometry); the writer flips to PDF's bottom-left space
internally.
"""
from __future__ import annotations

import io
import zlib
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
DEJAVU_BOLD = "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf"

PAGE_W, PAGE_H = 612.0, 792.0  # US Letter in points


# ---------------------------------------------------------------------------
# font metrics via PIL (advance widths in milli-em units for /Widths arrays)
# ---------------------------------------------------------------------------

_FONT_CACHE: Dict[str, Any] = {}


def _pil_font(path: str, size: int = 1000):
    from PIL import ImageFont

    key = f"{path}@{size}"
    if key not in _FONT_CACHE:
        _FONT_CACHE[key] = ImageFont.truetype(path, size)
    return _FONT_CACHE[key]


def text_width(text: str, size: float, font_path: str = DEJAVU) -> float:
    """Advance width of ``text`` at ``size`` pt."""
    f = _pil_font(font_path)
    return f.getlength(text) * size / 1000.0


def _widths_array(font_path: str) -> List[int]:
    """Advance widths for chars 32..255 (latin-1) in 1000/em units."""
    f = _pil_font(font_path)
    out = []
    for code in range(32, 256):
        try:
            out.append(int(round(f.getlength(chr(code)))))
        except Exception:
            out.append(600)
    return out


# ---------------------------------------------------------------------------
# ground truth records
# ---------------------------------------------------------------------------


@dataclass
class VisualTruth:
    kind: str                      # chart_bar | chart_line | chart_pie | flowchart | image | table_image
    bbox: Tuple[float, float, float, float]  # top-left-origin pts
    caption: Optional[str] = None
    figure_number: Optional[str] = None
    texts: List[str] = field(default_factory=list)  # strings drawn inside the visual
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class PageTruth:
    page_no: int                   # 0-based
    visuals: List[VisualTruth] = field(default_factory=list)
    text_blocks: List[Dict[str, Any]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# low-level PDF document builder
# ---------------------------------------------------------------------------


class PDFBuilder:
    """Accumulates numbered objects and serializes a classic xref-table PDF."""

    def __init__(self) -> None:
        self.objects: List[bytes] = []  # index i -> object number i+1

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def reserve(self) -> int:
        self.objects.append(b"")
        return len(self.objects)

    def set(self, num: int, body: bytes) -> None:
        self.objects[num - 1] = body

    def stream_obj(self, dict_entries: str, data: bytes, compress: bool = True) -> int:
        if compress:
            data = zlib.compress(data)
            dict_entries += " /Filter /FlateDecode"
        head = f"<< {dict_entries} /Length {len(data)} >>\nstream\n".encode("latin-1")
        return self.add(head + data + b"\nendstream")

    def serialize(self, root_num: int) -> bytes:
        buf = io.BytesIO()
        buf.write(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0] * (len(self.objects) + 1)
        for i, body in enumerate(self.objects):
            offsets[i + 1] = buf.tell()
            buf.write(f"{i + 1} 0 obj\n".encode("latin-1"))
            buf.write(body)
            buf.write(b"\nendobj\n")
        xref_at = buf.tell()
        buf.write(f"xref\n0 {len(self.objects) + 1}\n".encode("latin-1"))
        buf.write(b"0000000000 65535 f \n")
        for off in offsets[1:]:
            buf.write(f"{off:010d} 00000 n \n".encode("latin-1"))
        buf.write(
            (
                f"trailer\n<< /Size {len(self.objects) + 1} /Root {root_num} 0 R >>\n"
                f"startxref\n{xref_at}\n%%EOF\n"
            ).encode("latin-1")
        )
        return buf.getvalue()


# ---------------------------------------------------------------------------
# CID (Type0/Identity-H) text: Greek/math lines outside WinAnsi
# ---------------------------------------------------------------------------


class _CIDFontInfo:
    """fontTools-derived glyph table for one TTF: char -> (gid, width)."""

    def __init__(self, path: str):
        from fontTools.ttLib import TTFont

        tt = TTFont(path, fontNumber=0)
        self.cmap = tt.getBestCmap()
        upem = tt["head"].unitsPerEm
        hmtx = tt["hmtx"]
        order = tt.getGlyphOrder()
        gid_of = {name: i for i, name in enumerate(order)}
        self._gid_w: Dict[str, Tuple[int, int]] = {}
        self._upem, self._hmtx, self._gid_of = upem, hmtx, gid_of

    def glyph(self, ch: str) -> Optional[Tuple[int, int]]:
        """-> (gid, width in 1000/em) or None if the font lacks the char."""
        if ch not in self._gid_w:
            name = self.cmap.get(ord(ch))
            if name is None:
                self._gid_w[ch] = None
            else:
                gid = self._gid_of.get(name, 0)
                w = self._hmtx[name][0] * 1000 // self._upem
                self._gid_w[ch] = (gid, w)
        return self._gid_w[ch]


_CID_INFO: Dict[str, _CIDFontInfo] = {}


def _cid_info(path: str) -> _CIDFontInfo:
    if path not in _CID_INFO:
        _CID_INFO[path] = _CIDFontInfo(path)
    return _CID_INFO[path]


def _winansi_ok(s: str) -> bool:
    """True if PageCanvas.text can draw `s` through the single-byte path."""
    try:
        s.translate(_WINANSI).encode("latin-1")
        return True
    except UnicodeEncodeError:
        return False


# WinAnsiEncoding codepoints above latin-1 (PDF /WinAnsiEncoding): text
# drawn through PageCanvas.text maps these to their 0x80-0x9F byte slots
# so the content stream stays single-byte.
_WINANSI = str.maketrans({
    "€": "\x80", "‚": "\x82", "ƒ": "\x83",
    "„": "\x84", "…": "\x85", "†": "\x86",
    "‡": "\x87", "ˆ": "\x88", "‰": "\x89",
    "Š": "\x8a", "‹": "\x8b", "Œ": "\x8c",
    "Ž": "\x8e", "‘": "\x91", "’": "\x92",
    "“": "\x93", "”": "\x94", "•": "\x95",
    "–": "\x96", "—": "\x97", "˜": "\x98",
    "™": "\x99", "š": "\x9a", "›": "\x9b",
    "œ": "\x9c", "ž": "\x9e", "Ÿ": "\x9f",
})


class PageCanvas:
    """Content-stream builder for one page, top-left-origin API."""

    def __init__(self, width: float = PAGE_W, height: float = PAGE_H):
        self.w, self.h = width, height
        self.ops: List[str] = []
        self.images: List[Tuple[str, np.ndarray, Tuple[float, float, float, float], Optional[str]]] = []
        self.truth = PageTruth(page_no=-1)
        self._img_counter = 0
        self._extent: Optional[List[float]] = None
        self._tracking = False
        # chars drawn through the CID (/F3 regular, /F4 bold) fonts,
        # keyed by boldness — the book builds /W + ToUnicode from these
        self.cid_used: Dict[bool, set] = {False: set(), True: set()}

    # -- content-extent tracking --------------------------------------------

    def begin_extent(self) -> None:
        """Start accumulating the tight bbox of everything drawn, so visual
        ground truth records CONTENT bounds (what an ideal segmenter would
        box) rather than the reserved layout slot, which can include empty
        headroom/side padding no detector should be penalized for."""
        self._extent = None
        self._tracking = True

    def end_extent(self) -> Optional[Tuple[float, float, float, float]]:
        ext = self._extent
        self._extent = None
        self._tracking = False
        if not ext:
            return None
        return (max(0.0, ext[0] - 10.0), max(0.0, ext[1] - 10.0),
                min(self.w, ext[2] + 10.0), min(self.h, ext[3] + 10.0))

    def _track(self, x0: float, y0: float, x1: float, y1: float) -> None:
        if not self._tracking:
            return
        if self._extent is None:
            self._extent = [x0, y0, x1, y1]
        else:
            e = self._extent
            e[0] = min(e[0], x0)
            e[1] = min(e[1], y0)
            e[2] = max(e[2], x1)
            e[3] = max(e[3], y1)

    # -- primitives ---------------------------------------------------------

    def _y(self, y: float) -> float:
        return self.h - y

    def text(
        self,
        x: float,
        y: float,
        s: str,
        size: float = 10.0,
        bold: bool = False,
        record: bool = True,
        angle: float = 0.0,
    ) -> Tuple[float, float, float, float]:
        """Draw ``s`` with its baseline such that the glyph box top sits at
        ``y`` (top-left origin). Returns the text bbox (x0,y0,x1,y1).

        ``angle`` (degrees, counter-clockwise) rotates via the text
        matrix; only 0 and 90 produce exact truth bboxes (arbitrary
        angles return the 90-degree approximation)."""
        import math as _math

        ascent, descent = 0.76, 0.24  # DejaVuSans approx, of em
        wpath = DEJAVU_BOLD if bold else DEJAVU
        if _winansi_ok(s):
            font = "/F2" if bold else "/F1"
            esc = (s.translate(_WINANSI).replace("\\", r"\\")
                   .replace("(", r"\(").replace(")", r"\)"))
            payload = f"({esc})"
        else:
            # Greek/math outside WinAnsi: Type0/Identity-H — 2-byte glyph
            # ids in a hex string (no escaping needed). The engine's CID
            # path + ToUnicode recover the exact unicode on extraction.
            font = "/F4" if bold else "/F3"
            info = _cid_info(wpath)
            hx = []
            for ch in s:
                g = info.glyph(ch) or info.glyph("?")
                hx.append(f"{g[0]:04x}")
                self.cid_used[bold].add(ch if info.glyph(ch) else "?")
            payload = f"<{''.join(hx)}>"
        adv = text_width(s, size, wpath)
        if angle:
            rad = _math.radians(angle)
            ca, sa = _math.cos(rad), _math.sin(rad)
            # anchor: baseline start at (x, y) rotating CCW in PDF space
            self.ops.append(
                f"0 0 0 rg BT {font} {size:.2f} Tf "
                f"{ca:.4f} {sa:.4f} {-sa:.4f} {ca:.4f} "
                f"{x:.2f} {self._y(y):.2f} Tm {payload} Tj ET"
            )
            # 90-degree CCW: text runs UP the page from (x, y)
            em = (ascent + descent) * size
            bbox = (x - ascent * size, y - adv, x + descent * size, y)
            self._track(*bbox)
            if record:
                self.truth.text_blocks.append(
                    {"text": s, "bbox": list(bbox), "size": size}
                )
            return bbox
        baseline = y + ascent * size
        self.ops.append(
            f"0 0 0 rg BT {font} {size:.2f} Tf {x:.2f} {self._y(baseline):.2f} Td {payload} Tj ET"
        )
        bbox = (x, y, x + adv, y + (ascent + descent) * size)
        self._track(*bbox)
        if record:
            self.truth.text_blocks.append({"text": s, "bbox": list(bbox), "size": size})
        return bbox

    def rect(self, x0, y0, x1, y1, fill=None, stroke=(0, 0, 0), width=1.0):
        m = width / 2 if stroke is not None else 0.0
        self._track(x0 - m, y0 - m, x1 + m, y1 + m)
        cmds = [f"{width:.2f} w"]
        if fill is not None:
            cmds.append(f"{fill[0]:.3f} {fill[1]:.3f} {fill[2]:.3f} rg")
        if stroke is not None:
            cmds.append(f"{stroke[0]:.3f} {stroke[1]:.3f} {stroke[2]:.3f} RG")
        cmds.append(
            f"{x0:.2f} {self._y(y1):.2f} {x1 - x0:.2f} {y1 - y0:.2f} re"
        )
        if fill is not None and stroke is not None:
            cmds.append("B")
        elif fill is not None:
            cmds.append("f")
        else:
            cmds.append("S")
        self.ops.append(" ".join(cmds))

    def line(self, x0, y0, x1, y1, width=1.0, color=(0, 0, 0)):
        m = width / 2
        self._track(min(x0, x1) - m, min(y0, y1) - m,
                    max(x0, x1) + m, max(y0, y1) + m)
        self.ops.append(
            f"{width:.2f} w {color[0]:.3f} {color[1]:.3f} {color[2]:.3f} RG "
            f"{x0:.2f} {self._y(y0):.2f} m {x1:.2f} {self._y(y1):.2f} l S"
        )

    def polyline(self, pts: Sequence[Tuple[float, float]], width=1.5, color=(0, 0, 0)):
        m = width / 2
        self._track(min(p[0] for p in pts) - m, min(p[1] for p in pts) - m,
                    max(p[0] for p in pts) + m, max(p[1] for p in pts) + m)
        parts = [f"{width:.2f} w {color[0]:.3f} {color[1]:.3f} {color[2]:.3f} RG"]
        x, y = pts[0]
        parts.append(f"{x:.2f} {self._y(y):.2f} m")
        for x, y in pts[1:]:
            parts.append(f"{x:.2f} {self._y(y):.2f} l")
        parts.append("S")
        self.ops.append(" ".join(parts))

    def polygon(self, pts, fill=None, stroke=(0, 0, 0), width=1.0):
        m = width / 2 if stroke is not None else 0.0
        self._track(min(p[0] for p in pts) - m, min(p[1] for p in pts) - m,
                    max(p[0] for p in pts) + m, max(p[1] for p in pts) + m)
        parts = [f"{width:.2f} w"]
        if fill is not None:
            parts.append(f"{fill[0]:.3f} {fill[1]:.3f} {fill[2]:.3f} rg")
        if stroke is not None:
            parts.append(f"{stroke[0]:.3f} {stroke[1]:.3f} {stroke[2]:.3f} RG")
        x, y = pts[0]
        parts.append(f"{x:.2f} {self._y(y):.2f} m")
        for x, y in pts[1:]:
            parts.append(f"{x:.2f} {self._y(y):.2f} l")
        parts.append("h")
        if fill is not None and stroke is not None:
            parts.append("B")
        elif fill is not None:
            parts.append("f")
        else:
            parts.append("S")
        self.ops.append(" ".join(parts))

    def circle(self, cx, cy, r, fill=None, stroke=(0, 0, 0), width=1.0):
        m = width / 2 if stroke is not None else 0.0
        self._track(cx - r - m, cy - r - m, cx + r + m, cy + r + m)
        # four-arc cubic bezier approximation
        k = 0.5523 * r
        cyf = self._y(cy)
        parts = [f"{width:.2f} w"]
        if fill is not None:
            parts.append(f"{fill[0]:.3f} {fill[1]:.3f} {fill[2]:.3f} rg")
        if stroke is not None:
            parts.append(f"{stroke[0]:.3f} {stroke[1]:.3f} {stroke[2]:.3f} RG")
        parts.append(f"{cx + r:.2f} {cyf:.2f} m")
        for dx1, dy1, dx2, dy2, dx3, dy3 in [
            (r, k, k, r, 0, r),
            (-k, r, -r, k, -r, 0),
            (-r, -k, -k, -r, 0, -r),
            (k, -r, r, -k, r, 0),
        ]:
            parts.append(
                f"{cx + dx1:.2f} {cyf + dy1:.2f} {cx + dx2:.2f} {cyf + dy2:.2f} "
                f"{cx + dx3:.2f} {cyf + dy3:.2f} c"
            )
        parts.append("B" if (fill is not None and stroke is not None) else ("f" if fill is not None else "S"))
        self.ops.append(" ".join(parts))

    def arrow(self, x0, y0, x1, y1, width=1.2):
        self.line(x0, y0, x1, y1, width=width)
        dx, dy = x1 - x0, y1 - y0
        n = max((dx * dx + dy * dy) ** 0.5, 1e-6)
        ux, uy = dx / n, dy / n
        px, py = -uy, ux
        hl, hw = 7.0, 3.5
        self.polygon(
            [
                (x1, y1),
                (x1 - hl * ux + hw * px, y1 - hl * uy + hw * py),
                (x1 - hl * ux - hw * px, y1 - hl * uy - hw * py),
            ],
            fill=(0, 0, 0),
            stroke=None,
        )

    def image(self, arr: np.ndarray, x0, y0, x1, y1,
              mode: Optional[str] = None) -> str:
        """Place an RGB uint8 HxWx3 array as an image XObject.

        ``mode`` overrides the book-level encoding for this image:
        None (book default), "raw" (Flate RGB), "jpeg" (DCT RGB),
        "jp2" (lossless JPEG2000 /JPXDecode) or "cmyk_jpeg" (DCT
        DeviceCMYK with Adobe inversion — the print-workflow flavor
        real textbooks embed)."""
        self._img_counter += 1
        name = f"Im{self._img_counter}"
        self.images.append((name, arr, (x0, y0, x1, y1), mode))
        w, h = x1 - x0, y1 - y0
        self.ops.append(
            f"q {w:.2f} 0 0 {h:.2f} {x0:.2f} {self._y(y1):.2f} cm /{name} Do Q"
        )
        return name

    def paragraph(self, x, y, words: str, size=10.0, max_width=460.0, leading=1.35):
        """Greedy-wrapped body text; returns bottom y."""
        line: List[str] = []
        cy = y
        for word in words.split():
            candidate = " ".join(line + [word])
            if line and text_width(candidate, size) > max_width:
                self.text(x, cy, " ".join(line), size)
                cy += size * leading
                line = [word]
            else:
                line.append(word)
        if line:
            self.text(x, cy, " ".join(line), size)
            cy += size * leading
        return cy


# ---------------------------------------------------------------------------
# document assembly
# ---------------------------------------------------------------------------


class SyntheticBook:
    """Collects pages and serializes the final PDF with embedded DejaVu fonts."""

    def __init__(self, width: float = PAGE_W, height: float = PAGE_H,
                 jpeg_images: bool = False):
        self.w, self.h = width, height
        self.pages: List[PageCanvas] = []
        self.jpeg_images = jpeg_images

    def new_page(self) -> PageCanvas:
        c = PageCanvas(self.w, self.h)
        c.truth.page_no = len(self.pages)
        self.pages.append(c)
        return c

    @property
    def truths(self) -> List[PageTruth]:
        return [p.truth for p in self.pages]

    def _font_file(self, b: PDFBuilder, path: str) -> int:
        """Embed the TTF once per book (shared by simple + CID fonts)."""
        if not hasattr(self, "_ff_cache"):
            self._ff_cache: Dict[str, int] = {}
        if path not in self._ff_cache:
            data = open(path, "rb").read()
            self._ff_cache[path] = b.stream_obj(
                f"/Length1 {len(data)}", data, compress=True
            )
        return self._ff_cache[path]

    def _cid_font_objects(self, b: PDFBuilder, path: str, ps_name: str,
                          chars: set) -> int:
        """Type0/Identity-H composite font (PDF 9.7) over the full TTF:
        /W for the used glyphs, /CIDToGIDMap /Identity, ToUnicode CMap so
        the engine's text extraction recovers the drawn unicode."""
        ff = self._font_file(b, path)
        info = _cid_info(path)
        used: Dict[int, Tuple[int, int]] = {}  # gid -> (codepoint, width)
        for ch in sorted(chars):
            g = info.glyph(ch)
            if g:
                used[g[0]] = (ord(ch), g[1])
        desc = b.add(
            (
                f"<< /Type /FontDescriptor /FontName /{ps_name} /Flags 32 "
                f"/FontBBox [-1021 -463 1793 1232] /ItalicAngle 0 "
                f"/Ascent 760 /Descent -240 /CapHeight 730 /StemV 80 "
                f"/FontFile2 {ff} 0 R >>"
            ).encode("latin-1")
        )
        w_entries = " ".join(
            f"{gid} [{w}]" for gid, (_cp, w) in sorted(used.items())
        )
        cid = b.add(
            (
                f"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /{ps_name} "
                f"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                f"/Supplement 0 >> /FontDescriptor {desc} 0 R /DW 600 "
                f"/W [{w_entries}] /CIDToGIDMap /Identity >>"
            ).encode("latin-1")
        )
        tou = [
            "/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
            "1 begincodespacerange <0000> <FFFF> endcodespacerange"
        ]
        pairs = sorted(used.items())
        for i in range(0, len(pairs), 90):
            chunk = pairs[i:i + 90]
            tou.append(f"{len(chunk)} beginbfchar")
            for gid, (cp, _w) in chunk:
                tou.append(f"<{gid:04x}> <{cp:04x}>")
            tou.append("endbfchar")
        tou.append("endcmap end end")
        tounicode = b.stream_obj("", "\n".join(tou).encode("latin-1"))
        return b.add(
            (
                f"<< /Type /Font /Subtype /Type0 /BaseFont /{ps_name} "
                f"/Encoding /Identity-H /DescendantFonts [{cid} 0 R] "
                f"/ToUnicode {tounicode} 0 R >>"
            ).encode("latin-1")
        )

    def _font_objects(self, b: PDFBuilder, path: str, ps_name: str) -> int:
        ff = self._font_file(b, path)
        widths = _widths_array(path)
        desc = b.add(
            (
                f"<< /Type /FontDescriptor /FontName /{ps_name} /Flags 32 "
                f"/FontBBox [-1021 -463 1793 1232] /ItalicAngle 0 /Ascent 760 "
                f"/Descent -240 /CapHeight 730 /StemV 80 /FontFile2 {ff} 0 R >>"
            ).encode("latin-1")
        )
        wtxt = " ".join(str(w) for w in widths)
        return b.add(
            (
                f"<< /Type /Font /Subtype /TrueType /BaseFont /{ps_name} "
                f"/FirstChar 32 /LastChar 255 /Widths [{wtxt}] "
                f"/Encoding /WinAnsiEncoding /FontDescriptor {desc} 0 R >>"
            ).encode("latin-1")
        )

    def _image_object(self, b: PDFBuilder, arr: np.ndarray,
                      mode: Optional[str] = None) -> int:
        h, w = arr.shape[:2]
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        if mode is None:
            mode = "jpeg" if self.jpeg_images else "raw"
        if mode == "cmyk_jpeg":
            from PIL import Image

            bio = io.BytesIO()
            Image.fromarray(arr).convert("CMYK").save(
                bio, format="JPEG", quality=90
            )
            return b.stream_obj(
                f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceCMYK /BitsPerComponent 8 "
                f"/Filter /DCTDecode",
                bio.getvalue(),
                compress=False,
            )
        if mode == "jp2":
            from PIL import Image

            bio = io.BytesIO()
            Image.fromarray(arr).save(bio, format="JPEG2000")  # lossless jp2
            return b.stream_obj(
                f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                f"/Filter /JPXDecode",
                bio.getvalue(),
                compress=False,
            )
        if mode == "jpeg":
            from PIL import Image

            bio = io.BytesIO()
            Image.fromarray(arr).save(bio, format="JPEG", quality=90)
            return b.stream_obj(
                f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
                f"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode",
                bio.getvalue(),
                compress=False,
            )
        return b.stream_obj(
            f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8",
            arr.astype(np.uint8).tobytes(),
            compress=True,
        )

    def tobytes(self) -> bytes:
        b = PDFBuilder()
        catalog = b.reserve()
        pages_obj = b.reserve()
        f1 = self._font_objects(b, DEJAVU, "DejaVuSans")
        f2 = self._font_objects(b, DEJAVU_BOLD, "DejaVuSans-Bold")
        cid_reg = set().union(*(p.cid_used[False] for p in self.pages))
        cid_bold = set().union(*(p.cid_used[True] for p in self.pages))
        f3 = (self._cid_font_objects(b, DEJAVU, "DejaVuSans", cid_reg)
              if cid_reg else None)
        f4 = (self._cid_font_objects(b, DEJAVU_BOLD, "DejaVuSans-Bold",
                                     cid_bold) if cid_bold else None)
        kids = []
        for page in self.pages:
            xobj_entries = []
            for name, arr, _rect, mode in page.images:
                num = self._image_object(b, arr, mode)
                xobj_entries.append(f"/{name} {num} 0 R")
            content = b.stream_obj("", "\n".join(page.ops).encode("latin-1"))
            res = f"/Font << /F1 {f1} 0 R /F2 {f2} 0 R"
            if f3 is not None:
                res += f" /F3 {f3} 0 R"
            if f4 is not None:
                res += f" /F4 {f4} 0 R"
            res += " >>"
            if xobj_entries:
                res += f" /XObject << {' '.join(xobj_entries)} >>"
            pg = b.add(
                (
                    f"<< /Type /Page /Parent {pages_obj} 0 R "
                    f"/MediaBox [0 0 {page.w:.2f} {page.h:.2f}] "
                    f"/Resources << {res} >> /Contents {content} 0 R >>"
                ).encode("latin-1")
            )
            kids.append(f"{pg} 0 R")
        b.set(
            pages_obj,
            (
                f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {len(kids)} >>"
            ).encode("latin-1"),
        )
        b.set(catalog, f"<< /Type /Catalog /Pages {pages_obj} 0 R >>".encode("latin-1"))
        return b.serialize(catalog)

    def save(self, path: str) -> List[PageTruth]:
        with open(path, "wb") as f:
            f.write(self.tobytes())
        return self.truths


# ---------------------------------------------------------------------------
# page templates (textbook-like content with known ground truth)
# ---------------------------------------------------------------------------

_LOREM = (
    "The portfolio return depends on the weighted average of individual asset "
    "returns where weights reflect the fraction of wealth allocated to each "
    "position. Diversification lowers total variance because asset returns "
    "are imperfectly correlated, so idiosyncratic shocks partially offset. "
    "The investor chooses the allocation that maximizes expected utility "
    "subject to the budget constraint and a tolerance for risk."
)


def _caption(c: PageCanvas, x: float, y: float, fig: str, text: str):
    """Draw a figure caption; returns (caption string, caption bbox).
    Drawn with extent tracking suspended: the truth bbox unions the RAW
    caption box (no 10pt content pad), matching the reference."""
    s = f"Figure {fig} {text}"
    was = c._tracking
    c._tracking = False
    b = c.text(x, y, s, size=9.0, bold=False)
    c._tracking = was
    return s, b


def _visual_truth_bbox(c: PageCanvas, cap_bbox) -> Tuple[float, float, float, float]:
    """The box the reference pipeline emits for a visual: CONTENT extent
    padded 10pt (ref :3426-3509) unioned with the RAW caption bbox, bottom
    extended 5pt below the caption (ref :3237-3244), clipped to the page.
    end_extent() must be called BEFORE the caption is drawn."""
    ext = c.end_extent()
    return (
        max(0.0, min(ext[0], cap_bbox[0])),
        max(0.0, min(ext[1], cap_bbox[1])),
        min(c.w, max(ext[2], cap_bbox[2])),
        min(c.h, cap_bbox[3] + 5.0),
    )


def add_bar_chart(c: PageCanvas, x0, y0, x1, y1, fig: str, rng: np.random.Generator):
    c.begin_extent()
    texts: List[str] = []
    pad_l, pad_b, pad_t = 42, 30, 24
    ax0, ay0, ax1, ay1 = x0 + pad_l, y0 + pad_t, x1 - 10, y1 - pad_b
    # grid
    for i in range(5):
        gy = ay0 + (ay1 - ay0) * i / 4
        c.line(ax0, gy, ax1, gy, width=0.4, color=(0.75, 0.75, 0.75))
    # axes
    c.line(ax0, ay0, ax0, ay1, width=1.2)
    c.line(ax0, ay1, ax1, ay1, width=1.2)
    n = int(rng.integers(4, 7))
    bw = (ax1 - ax0) / (n * 1.6)
    colors = [(0.12, 0.35, 0.65), (0.85, 0.45, 0.1), (0.2, 0.55, 0.25)]
    vals = rng.uniform(0.25, 1.0, size=n)
    for i in range(n):
        bx = ax0 + (i + 0.35) * (ax1 - ax0) / n
        bh = (ay1 - ay0 - 6) * vals[i]
        c.rect(bx, ay1 - bh, bx + bw, ay1, fill=colors[i % 3], stroke=None)
        lbl = f"Q{i + 1}"
        b = c.text(bx, ay1 + 4, lbl, size=7.0, record=False)
        texts.append(lbl)
        c.truth.text_blocks.append({"text": lbl, "bbox": list(b), "size": 7.0})
    # y tick labels
    for i in range(5):
        v = f"{int(100 - 25 * i)}"
        gy = ay0 + (ay1 - ay0) * i / 4
        b = c.text(x0 + 10, gy - 4, v, size=7.0, record=False)
        c.truth.text_blocks.append({"text": v, "bbox": list(b), "size": 7.0})
        texts.append(v)
    yl = "Return %"
    b = c.text(x0 + 2, y0 + 2, yl, size=7.5, record=False)
    c.truth.text_blocks.append({"text": yl, "bbox": list(b), "size": 7.5})
    texts.append(yl)
    # Greek/math annotation (VERDICT round-3 item 1c): finance charts
    # carry volatility/beta notation — eval CER must cover the glyphs
    # the reference's PaddleOCR read natively (ref :1088-1126)
    gm = [f"σ ≈ {rng.uniform(5, 25):.1f}%", f"β = {rng.uniform(0.5, 1.8):.2f}",
          f"μ ≥ {rng.uniform(2, 9):.1f}%"][int(rng.integers(0, 3))]
    b = c.text(ax1 - 64, ay0 + 4, gm, size=7.5, record=False)
    c.truth.text_blocks.append({"text": gm, "bbox": list(b), "size": 7.5})
    texts.append(gm)
    cap, capb = _caption(c, x0, y1 + 8, fig, "Quarterly returns by period")
    c.truth.visuals.append(
        VisualTruth("chart_bar", _visual_truth_bbox(c, capb), caption=cap,
                    figure_number=f"Figure {fig}", texts=texts,
                    extra={"bars": n, "grid": True})
    )


def add_line_chart(c: PageCanvas, x0, y0, x1, y1, fig: str, rng: np.random.Generator):
    c.begin_extent()
    texts: List[str] = []
    pad_l, pad_b, pad_t = 42, 30, 12
    ax0, ay0, ax1, ay1 = x0 + pad_l, y0 + pad_t, x1 - 10, y1 - pad_b
    for i in range(5):
        gy = ay0 + (ay1 - ay0) * i / 4
        c.line(ax0, gy, ax1, gy, width=0.4, color=(0.8, 0.8, 0.8))
    c.line(ax0, ay0, ax0, ay1, width=1.2)
    c.line(ax0, ay1, ax1, ay1, width=1.2)
    for s, color in enumerate([(0.1, 0.3, 0.7), (0.8, 0.2, 0.15)]):
        k = int(rng.integers(8, 14))
        ys = rng.uniform(0.15, 0.9, size=k)
        pts = [
            (ax0 + (ax1 - ax0) * i / (k - 1), ay1 - (ay1 - ay0 - 8) * ys[i])
            for i in range(k)
        ]
        c.polyline(pts, width=1.6, color=color)
    for i, lbl in enumerate(["2019", "2020", "2021", "2022"]):
        bx = ax0 + (ax1 - ax0) * i / 3 - 8
        b = c.text(bx, ay1 + 4, lbl, size=7.0, record=False)
        c.truth.text_blocks.append({"text": lbl, "bbox": list(b), "size": 7.0})
        texts.append(lbl)
    # legend entries carry beta notation (Greek/math eval coverage)
    leg = [f"Stocks β={rng.uniform(0.8, 1.6):.2f}",
           f"Bonds σ={rng.uniform(3, 9):.1f}%"]
    for i, item in enumerate(leg):
        ly = y0 + 16 + i * 13
        c.line(x1 - 108, ly + 4, x1 - 94, ly + 4, width=1.6,
               color=[(0.1, 0.3, 0.7), (0.8, 0.2, 0.15)][i])
        b = c.text(x1 - 90, ly - 2, item, size=7.0, record=False)
        c.truth.text_blocks.append({"text": item, "bbox": list(b), "size": 7.0})
        texts.append(item)
    xl = "Year"
    b = c.text((ax0 + ax1) / 2 - 12, y1 - 12, xl, size=7.5, record=False)
    c.truth.text_blocks.append({"text": xl, "bbox": list(b), "size": 7.5})
    texts.append(xl)
    cap, capb = _caption(c, x0, y1 + 8, fig, "Cumulative performance of stocks and bonds")
    c.truth.visuals.append(
        VisualTruth("chart_line", _visual_truth_bbox(c, capb), caption=cap,
                    figure_number=f"Figure {fig}", texts=texts,
                    extra={"series": 2, "grid": True})
    )


def add_pie_chart(c: PageCanvas, x0, y0, x1, y1, fig: str, rng: np.random.Generator):
    c.begin_extent()
    texts: List[str] = []
    cx, cy = (x0 + x1) / 2 - 30, (y0 + y1) / 2
    r = min(x1 - x0, y1 - y0) / 2 - 28
    c.circle(cx, cy, r, fill=(0.93, 0.8, 0.3), stroke=(0, 0, 0), width=1.0)
    # wedge separators
    angles = np.cumsum(rng.dirichlet(np.ones(4))) * 2 * np.pi
    for a in angles:
        c.line(cx, cy, cx + r * np.cos(a), cy + r * np.sin(a), width=1.0)
    for i, item in enumerate(["Equities", "Bonds", "Cash", "Alts"]):
        ly = y0 + 18 + i * 13
        c.rect(x1 - 86, ly, x1 - 76, ly + 8, fill=(0.3 + 0.15 * i, 0.4, 0.7 - 0.1 * i), stroke=None)
        b = c.text(x1 - 72, ly - 2, item, size=7.0, record=False)
        c.truth.text_blocks.append({"text": item, "bbox": list(b), "size": 7.0})
        texts.append(item)
    cap, capb = _caption(c, x0, y1 + 8, fig, "Asset allocation of the model portfolio")
    c.truth.visuals.append(
        VisualTruth("chart_pie", _visual_truth_bbox(c, capb), caption=cap,
                    figure_number=f"Figure {fig}", texts=texts,
                    extra={"slices": 4})
    )


def add_flowchart(c: PageCanvas, x0, y0, x1, y1, fig: str, rng: np.random.Generator):
    c.begin_extent()
    texts: List[str] = []
    w = x1 - x0
    boxes = [
        ("Start", x0 + w / 2 - 40, y0 + 8),
        ("Screen assets", x0 + w / 2 - 40, y0 + 58),
        ("Risk check", x0 + w / 2 - 40, y0 + 108),
    ]
    for label, bx, by in boxes:
        c.rect(bx, by, bx + 80, by + 26, fill=(0.9, 0.93, 1.0), stroke=(0, 0, 0))
        b = c.text(bx + 8, by + 7, label, size=7.5, record=False)
        c.truth.text_blocks.append({"text": label, "bbox": list(b), "size": 7.5})
        texts.append(label)
    c.arrow(x0 + w / 2, y0 + 34, x0 + w / 2, y0 + 56)
    c.arrow(x0 + w / 2, y0 + 84, x0 + w / 2, y0 + 106)
    # decision diamond
    dx, dy = x0 + w / 2, y0 + 168
    c.polygon(
        [(dx, dy - 20), (dx + 48, dy), (dx, dy + 20), (dx - 48, dy)],
        fill=(1.0, 0.95, 0.85),
    )
    b = c.text(dx - 26, dy - 6, "Approve?", size=7.5, record=False)
    c.truth.text_blocks.append({"text": "Approve?", "bbox": list(b), "size": 7.5})
    texts.append("Approve?")
    c.arrow(dx, y0 + 134, dx, dy - 22)
    c.arrow(dx + 48, dy, x1 - 60, dy)
    yes = c.text(x1 - 56, dy - 6, "Execute", size=7.5, record=False)
    c.truth.text_blocks.append({"text": "Execute", "bbox": list(yes), "size": 7.5})
    texts.append("Execute")
    cap, capb = _caption(c, x0, y1 + 8, fig, "Investment decision process")
    c.truth.visuals.append(
        VisualTruth("flowchart", _visual_truth_bbox(c, capb), caption=cap,
                    figure_number=f"Figure {fig}", texts=texts,
                    extra={"nodes": 5, "arrows": 4, "decision": True})
    )


def _photo_array(rng: np.random.Generator, h: int = 180, w: int = 300) -> np.ndarray:
    """Smooth pseudo-photo: low-frequency noise blended across channels."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for ch in range(3):
        f1, f2 = rng.uniform(0.5, 2.5, size=2)
        p1, p2 = rng.uniform(0, 6.28, size=2)
        img[..., ch] = (
            0.5
            + 0.25 * np.sin(f1 * 6.28 * xx / w + p1)
            + 0.25 * np.cos(f2 * 6.28 * yy / h + p2)
        )
    img += rng.normal(0, 0.04, size=img.shape).astype(np.float32)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def _table_array(rng: np.random.Generator) -> np.ndarray:
    """A rendered spreadsheet-like table image (text-dense embedded graphic)."""
    from PIL import Image, ImageDraw, ImageFont

    w, h = 460, 260
    img = Image.new("RGB", (w, h), (255, 255, 255))
    d = ImageDraw.Draw(img)
    font = ImageFont.truetype(DEJAVU, 13)
    headers = ["Asset", "Weight", "Return", "Vol"]
    rows = [
        [f"Fund {chr(65 + i)}", f"{rng.uniform(5, 40):.1f}%", f"{rng.uniform(-5, 15):.2f}%", f"{rng.uniform(4, 25):.1f}%"]
        for i in range(7)
    ]
    for j, hd in enumerate(headers):
        d.text((14 + j * 112, 10), hd, fill=(0, 0, 0), font=font)
    d.line([(8, 34), (w - 8, 34)], fill=(0, 0, 0), width=2)
    for i, row in enumerate(rows):
        for j, cell in enumerate(row):
            d.text((14 + j * 112, 44 + i * 28), cell, fill=(20, 20, 20), font=font)
        d.line([(8, 66 + i * 28), (w - 8, 66 + i * 28)], fill=(180, 180, 180), width=1)
    return np.asarray(img)


def add_embedded_image(c: PageCanvas, x0, y0, x1, y1, rng: np.random.Generator,
                       table: bool = False):
    arr = _table_array(rng) if table else _photo_array(rng)
    c.image(arr, x0, y0, x1, y1)
    c.truth.visuals.append(
        VisualTruth("table_image" if table else "image", (x0, y0, x1, y1),
                    extra={"shape": list(arr.shape)})
    )


# ---------------------------------------------------------------------------
# book templates
# ---------------------------------------------------------------------------


def make_test_book(path: str, pages: int = 12, seed: int = 0,
                   jpeg_images: bool = False) -> List[PageTruth]:
    """A textbook-like PDF cycling through visual templates.

    Page cycle: [text, bar chart, line chart, flowchart, embedded photo,
    pie chart, table image, two-visuals]."""
    rng = np.random.default_rng(seed)
    book = SyntheticBook(jpeg_images=jpeg_images)
    chapter = 1
    for p in range(pages):
        c = book.new_page()
        kind = p % 8
        c.text(72, 40, f"Chapter {chapter}: Portfolio Theory", size=15.0, bold=True)
        y = c.paragraph(72, 76, _LOREM, size=10.0)
        fig = f"{chapter}.{(p % 8) + 1}"
        if kind == 0:
            c.paragraph(72, y + 8, _LOREM, size=10.0)
            c.paragraph(72, y + 140, _LOREM, size=10.0)
        elif kind == 1:
            add_bar_chart(c, 110, y + 30, 470, y + 240, fig, rng)
        elif kind == 2:
            add_line_chart(c, 110, y + 30, 470, y + 240, fig, rng)
        elif kind == 3:
            add_flowchart(c, 140, y + 30, 460, y + 250, fig, rng)
        elif kind == 4:
            add_embedded_image(c, 150, y + 40, 450, y + 220, rng)
        elif kind == 5:
            add_pie_chart(c, 130, y + 30, 450, y + 230, fig, rng)
        elif kind == 6:
            add_embedded_image(c, 110, y + 40, 480, y + 250, rng, table=True)
        else:
            add_bar_chart(c, 90, y + 30, 300, y + 190, fig, rng)
            add_embedded_image(c, 330, y + 50, 520, y + 180, rng)
        c.paragraph(72, 620, _LOREM, size=10.0)
        c.text(290, 752, str(p + 1), size=9.0)
        if (p + 1) % 8 == 0:
            chapter += 1
    return book.save(path)


def _scanned_page_array(rng: np.random.Generator, h: int = 660,
                        w: int = 510) -> np.ndarray:
    """A scanned-textbook-page lookalike: text-line stripes, slight skew,
    sensor noise, grey background — the IMAGE/scanned_page class the
    reference tagged via text-density thresholds (ref :1791-1810)."""
    base = np.full((h, w), 235, np.float32)
    y = 30
    while y < h - 40:
        line_h = int(rng.integers(8, 12))
        x = 40
        while x < w - 50:
            seg = int(rng.integers(15, 60))
            if rng.random() > 0.25:
                base[y:y + line_h, x:x + seg] -= rng.uniform(90, 150)
            x += seg + int(rng.integers(4, 10))
        y += line_h + int(rng.integers(5, 9))
    base += rng.normal(0, 6.0, base.shape)
    # slight rotation via shear-ish row shift (cheap 0.5-degree skew)
    out = np.clip(base, 0, 255).astype(np.uint8)
    shift = (np.arange(h) * 0.008).astype(int)
    for i in range(h):
        out[i] = np.roll(out[i], shift[i])
    return np.stack([out] * 3, axis=-1)


def make_diverse_book(path: str, seed: int = 0) -> List[PageTruth]:
    """Fixture-diversity book (VERDICT round-1 item 10): layouts and
    encodings the standard cycle never produces, each with ground truth.

    Page cycle (5): [two-column text + narrow column chart, rotated-label
    line chart, CMYK-JPEG photo, scanned-page raster, three-visual page].
    """
    rng = np.random.default_rng(seed)
    book = SyntheticBook()
    truths_meta = []
    for p in range(10):
        c = book.new_page()
        kind = p % 5
        c.text(72, 40, "Chapter 9: Market Microstructure", size=15.0,
               bold=True)
        fig = f"9.{p + 1}"
        if kind == 0:
            # TWO-COLUMN layout: narrow body columns; chart inside the
            # right column (the reference's body-text heuristics assume
            # wide paragraphs — column text must not read as body bounds)
            c.paragraph(60, 76, _LOREM, size=9.0, max_width=220)
            c.paragraph(60, 210, _LOREM, size=9.0, max_width=220)
            c.paragraph(60, 350, _LOREM, size=9.0, max_width=220)
            c.paragraph(320, 76, _LOREM, size=9.0, max_width=220)
            add_bar_chart(c, 320, 240, 545, 420, fig, rng)
            c.paragraph(320, 470, _LOREM, size=9.0, max_width=220)
        elif kind == 1:
            # ROTATED y-axis label on a line chart
            y = c.paragraph(72, 76, _LOREM, size=10.0)
            c.begin_extent()
            add_line_chart(c, 120, y + 30, 470, y + 240, fig, rng)
            # overwrite the last truth with one including the rotated label
            t = c.truth.visuals.pop()
            c.begin_extent()
            c._track(*t.bbox)
            c.text(100, y + 160, "Cumulative %", size=7.5, angle=90)
            ext = c.end_extent()
            c.truth.visuals.append(
                VisualTruth(t.kind, (min(ext[0] + 10, t.bbox[0]), t.bbox[1],
                                     t.bbox[2], t.bbox[3]),
                            caption=t.caption, figure_number=t.figure_number,
                            texts=t.texts + ["Cumulative %"], extra=t.extra)
            )
        elif kind == 2:
            # CMYK JPEG (print-workflow flavor)
            y = c.paragraph(72, 76, _LOREM, size=10.0)
            arr = _photo_array(rng)
            c.image(arr, 150, y + 40, 450, y + 220, mode="cmyk_jpeg")
            c.truth.visuals.append(
                VisualTruth("image", (150, y + 40, 450, y + 220),
                            extra={"shape": list(arr.shape),
                                   "encoding": "cmyk_jpeg"})
            )
        elif kind == 3:
            # SCANNED PAGE: one full-page-ish raster of text
            arr = _scanned_page_array(rng)
            c.image(arr, 51, 66, 561, 726, mode="jpeg")
            c.truth.visuals.append(
                VisualTruth("scanned_page", (51, 66, 561, 726),
                            extra={"shape": list(arr.shape)})
            )
        else:
            # THREE visuals on one page
            y = 76
            add_bar_chart(c, 72, y, 280, y + 150, fig, rng)
            add_pie_chart(c, 320, y, 540, y + 150, f"9.{p + 1}b", rng)
            add_embedded_image(c, 150, y + 230, 450, y + 400, rng)
            c.paragraph(72, 540, _LOREM, size=10.0)
        c.text(290, 752, str(p + 1), size=9.0)
        truths_meta.append(kind)
    out = book.save(path)
    for t, kind in zip(out, truths_meta):
        for v in t.visuals:
            v.extra.setdefault("fixture_class", (
                "two_column", "rotated_label", "cmyk_jpeg", "scanned_page",
                "multi_visual")[kind])
    return out


def make_scanned_book(path: str, pages: int = 4, seed: int = 0,
                      noise: float = 5.0, skew: float = 0.004):
    """Scanned-textbook fixture with REAL text: each page is one full-page
    raster of rendered paragraphs (PIL truetype, so glyph shapes differ
    from the vector-text renderer) with grey background, sensor noise and
    slight skew — the content class PaddleOCR handled for the reference
    (photos/scans, ref :1791-1810) and a deterministic oracle for
    scanned-page OCR CER.

    Returns (truths, expected_texts): expected_texts[p] is the exact text
    drawn on page p."""
    from PIL import Image, ImageDraw, ImageFont

    rng = np.random.default_rng(seed)
    book = SyntheticBook()
    texts: List[str] = []
    font = ImageFont.truetype(DEJAVU, 22)
    # Greek/math word classes interleave with prose: scanned finance
    # pages are full of "βp = 1.2"-style notation (VERDICT r3 item 1c)
    _gm = ["βp = 1.2", "σ² = 0.04", "Δ ≈ 0.62", "∑ wi = 1", "μ ≥ 4%",
           "α = 2.1%", "√252", "σij", "E(r) ≈ 8.5%", "θ = ∂V/∂t"]
    words_src = (_LOREM + " " + _LOREM + " " + _LOREM).split()
    W, H = 1020, 1320
    for p in range(pages):
        img = Image.new("L", (W, H), 235)
        d = ImageDraw.Draw(img)
        rng.shuffle(words_src)
        words = list(words_src)
        # splice one formula token into every ~12th slot
        for k in range(len(words) // 12):
            words.insert(
                int(rng.integers(0, len(words))),
                _gm[int(rng.integers(0, len(_gm)))],
            )
        lines: List[str] = []
        y, i = 60, 0
        while y < H - 90 and i < len(words):
            line: List[str] = []
            while (
                i < len(words)
                and d.textlength(" ".join(line + [words[i]]), font=font)
                < W - 160
            ):
                line.append(words[i])
                i += 1
            if not line:
                break
            lines.append(" ".join(line))
            d.text((80, y), lines[-1], fill=30, font=font)
            y += 34
        arr = np.array(img).astype(np.float32)
        arr += rng.normal(0, noise, arr.shape)
        arr = np.clip(arr, 0, 255).astype(np.uint8)
        if skew:
            shift = (np.arange(H) * skew * W / H).astype(int)
            for r in range(H):
                arr[r] = np.roll(arr[r], shift[r])
        arr3 = np.stack([arr] * 3, axis=-1)
        c = book.new_page()
        c.text(72, 40, f"Chapter {p + 1}: Archive Scans", size=15.0,
               bold=True)
        c.image(arr3, 51, 66, 561, 726, mode="jpeg")
        c.truth.visuals.append(
            VisualTruth("scanned_page", (51, 66, 561, 726),
                        texts=lines, extra={"fixture_class": "scanned_page"})
        )
        texts.append("\n".join(lines))
    truths = book.save(path)
    return truths, texts
