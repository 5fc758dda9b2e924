"""Foreign-toolchain PDF corpus: multi-page books produced by toolchains
this repo does not control, for end-to-end ingestion validation (the
reference proved arbitrary-textbook ingestion on a real 1,000-page book,
/root/reference/investments_segmented/). Three independent producers:

1. matplotlib ``backend_pdf`` — its own PDF writer; ``pdf.fonttype=3``
   emits Type3 CharProc fonts (the LaTeX-class case), ``42`` emits
   subsetted embedded TrueType.
2. Pillow's PDF writer — image-per-page books (the scanned-book shape).
3. fontTools + cross-stream assembly — PDF 1.5 xref STREAMS + object
   streams with a real subsetted TrueType (DejaVu) embedded as a CID
   (Type0/Identity-H) font, the shape modern generators emit.
"""
from __future__ import annotations

import io
import os
import zlib


def make_mpl_book(path: str, fonttype: int = 3, pages: int = 6) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from matplotlib.backends.backend_pdf import PdfPages

    matplotlib.rcParams["pdf.fonttype"] = fonttype

    with PdfPages(path) as pdf:
        rng = np.random.default_rng(7)
        for p in range(pages):
            kind = p % 6
            if kind in (0, 3):
                fig, ax = plt.subplots(figsize=(6, 4))
                x = np.linspace(0, 10, 60)
                ax.plot(x, np.sin(x + p), label="revenue")
                ax.plot(x, 0.5 * np.cos(x), label="cost", linestyle="--")
                ax.legend()
                ax.set_xlabel("year")
                ax.set_ylabel("value ($M)")
                ax.grid(True)
                fig.text(0.5, 0.02,
                         f"Figure {p + 1}.1 Revenue and cost, scenario {p}",
                         ha="center")
            elif kind in (1, 4):
                fig, ax = plt.subplots(figsize=(6, 4))
                ax.bar(list("ABCDEF"), rng.integers(1, 9, 6),
                       color="steelblue")
                fig.text(0.5, 0.02, f"Figure {p + 1}.1 Portfolio weights {p}",
                         ha="center")
            elif kind == 2:
                fig, ax = plt.subplots(figsize=(5, 5))
                ax.pie([40, 30, 20, 10],
                       labels=["stocks", "bonds", "cash", "gold"])
                fig.text(0.5, 0.02, f"Figure {p + 1}.1 Asset allocation",
                       ha="center")
            else:
                fig, ax = plt.subplots(figsize=(6, 4))
                ax.scatter(rng.normal(size=80), rng.normal(size=80), s=12)
                ax.set_xlabel("risk")
                ax.set_ylabel("return")
                fig.text(0.5, 0.02, f"Figure {p + 1}.1 Risk-return scatter",
                         ha="center")
            pdf.savefig(fig)
            plt.close(fig)


def make_pil_book(path: str, pages: int = 4) -> None:
    from PIL import Image, ImageDraw

    imgs = []
    for i in range(pages):
        img = Image.new("RGB", (612, 792), "white")
        d = ImageDraw.Draw(img)
        d.rectangle([100, 150, 500, 450], outline="black", width=3)
        d.ellipse([150 + 30 * i, 200, 350 + 30 * i, 400],
                  fill=(200, 60, 40))
        d.rectangle([120, 180, 220, 260], fill=(60, 120, 200))
        d.text((110, 470), f"Figure {i + 1}.1 A page-image diagram",
               fill="black")
        for y in range(520, 700, 14):
            d.line([(72, y), (540, y)], fill=(30, 30, 30), width=1)
        imgs.append(img)
    imgs[0].save(path, save_all=True, append_images=imgs[1:], resolution=72)


def _dejavu_path() -> str:
    import matplotlib

    return os.path.join(matplotlib.get_data_path(), "fonts", "ttf",
                        "DejaVuSans.ttf")


def _subset_ttf(text: str) -> bytes:
    """Subset DejaVuSans to the glyphs in ``text`` with fontTools."""
    from fontTools import subset

    opts = subset.Options()
    opts.retain_gids = False
    opts.notdef_outline = True
    font = subset.load_font(_dejavu_path(), opts)
    sub = subset.Subsetter(opts)
    sub.populate(text=text)
    sub.subset(font)
    bio = io.BytesIO()
    font.save(bio)
    return bio.getvalue()


def make_fonttools_book(path: str, pages: int = 4) -> None:
    """Multi-page PDF 1.5 book: xref STREAM + object stream, subsetted
    DejaVu TTF embedded as a Type0/Identity-H CID font, vector bar chart
    per page, caption lines — the structural shape of modern generators
    (which classic xref-table fixtures don't cover)."""
    from fontTools.ttLib import TTFont

    text_pool = ("Figure .0123456789 Quarterly flows chart bar value "
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                 "abcdefghijklmnopqrstuvwxyz$%()")
    ttf_bytes = _subset_ttf(text_pool)
    tt = TTFont(io.BytesIO(ttf_bytes))
    cmap = tt.getBestCmap()
    upem = tt["head"].unitsPerEm
    hmtx = tt["hmtx"]
    order = tt.getGlyphOrder()
    gid_of = {name: i for i, name in enumerate(order)}

    def encode_text(s: str) -> tuple[bytes, list[tuple[int, int, int]]]:
        """UTF-16BE-style 2-byte GIDs + per-gid width records."""
        out = bytearray()
        widths = []
        for ch in s:
            name = cmap.get(ord(ch))
            gid = gid_of.get(name, 0) if name else 0
            out += bytes([gid >> 8, gid & 0xFF])
            if name:
                w = hmtx[name][0] * 1000 // upem
                widths.append((gid, ord(ch), w))
        return bytes(out), widths

    all_widths: dict[int, tuple[int, int]] = {}

    def hexstr(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    # --- build page content streams -------------------------------------
    contents = []
    captions = []
    for p in range(pages):
        cap = f"Figure {p + 1}.1 Quarterly flows {p}"
        captions.append(cap)
        enc, wrec = encode_text(cap)
        for gid, cp, w in wrec:
            all_widths[gid] = (cp, w)
        bars = b""
        for i in range(4):
            h = 40 + 37 * ((p + i) % 4)
            bars += (b"%d 220 40 %d re f\n" % (120 + i * 70, h))
        body = (b"0.2 0.4 0.7 rg\n" + bars +
                b"0 0 0 rg 2 w 100 200 m 420 200 l S\n"
                b"BT /F1 14 Tf 100 160 Td " + hexstr(enc) + b" Tj ET\n")
        contents.append(zlib.compress(body))

    # --- object layout ---------------------------------------------------
    # 1 catalog, 2 pages, 3..3+N-1 page dicts, then per-page content
    # streams, then font objects, then objstm + xref stream.
    objs: dict[int, bytes] = {}
    n_pg = pages
    first_content = 3 + n_pg
    font_obj = first_content + n_pg          # Type0 font
    desc_font = font_obj + 1                 # CIDFontType2
    font_desc = desc_font + 1                # FontDescriptor
    font_file = font_desc + 1                # FontFile2 stream
    objstm_num = font_file + 1
    xref_num = objstm_num + 1

    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n_pg))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pg)
    for i in range(n_pg):
        objs[3 + i] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_obj, first_content + i))

    w_entries = b" ".join(b"%d [%d]" % (gid, w)
                          for gid, (cp, w) in sorted(all_widths.items()))
    objs[font_obj] = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /DejaVuSans "
        b"/Encoding /Identity-H /DescendantFonts [%d 0 R] "
        b"/ToUnicode %d 0 R >>" % (desc_font, xref_num + 1))
    objs[desc_font] = (
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /DejaVuSans "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor %d 0 R /DW 500 "
        b"/W [" % font_desc + w_entries + b"] /CIDToGIDMap /Identity >>")
    objs[font_desc] = (
        b"<< /Type /FontDescriptor /FontName /DejaVuSans /Flags 32 "
        b"/FontBBox [-100 -300 1200 1000] /ItalicAngle 0 /Ascent 900 "
        b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile2 %d 0 R >>"
        % font_file)

    # ToUnicode CMap (gid -> unicode)
    tou = [b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
           b"1 begincodespacerange <0000> <FFFF> endcodespacerange"]
    pairs = sorted(all_widths.items())
    for i in range(0, len(pairs), 90):
        chunk = pairs[i:i + 90]
        tou.append(b"%d beginbfchar" % len(chunk))
        for gid, (cp, _w) in chunk:
            tou.append(b"<%04x> <%04x>" % (gid, cp))
        tou.append(b"endbfchar")
    tou.append(b"endcmap end end")
    tou_data = b"\n".join(tou)
    tounicode_num = xref_num + 1

    # --- serialize: small dicts go into an OBJECT STREAM ----------------
    objstm_members = [1, 2] + [3 + i for i in range(n_pg)] + [
        font_obj, desc_font, font_desc]
    direct: dict[int, bytes] = {}   # num -> full "obj..endobj" body
    for i in range(n_pg):
        z = contents[i]
        direct[first_content + i] = (
            b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(z)
            + z + b"\nendstream")
    direct[font_file] = (
        b"<< /Length %d /Length1 %d >>\nstream\n"
        % (len(ttf_bytes), len(ttf_bytes)) + ttf_bytes + b"\nendstream")
    direct[tounicode_num] = (
        b"<< /Length %d >>\nstream\n" % len(tou_data) + tou_data
        + b"\nendstream")

    # object stream payload
    header = []
    payload = b""
    for num in objstm_members:
        header.append(b"%d %d" % (num, len(payload)))
        payload += objs[num] + b"\n"
    head_str = b" ".join(header) + b"\n"
    stm_data = zlib.compress(head_str + payload)
    direct[objstm_num] = (
        b"<< /Type /ObjStm /N %d /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n"
        % (len(objstm_members), len(head_str), len(stm_data))
        + stm_data + b"\nendstream")

    # --- write file with an xref STREAM ---------------------------------
    out = io.BytesIO()
    out.write(b"%PDF-1.5\n%\xc2\xa5\xc2\xb1\xc3\xab\n")
    offsets: dict[int, int] = {}
    for num in sorted(direct):
        offsets[num] = out.tell()
        out.write(b"%d 0 obj\n" % num)
        out.write(direct[num])
        out.write(b"\nendobj\n")

    # xref stream entries: type 1 (offset) for direct, type 2 for objstm
    max_num = tounicode_num
    rows = []
    for num in range(max_num + 1):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        elif num in objstm_members:
            rows.append((2, objstm_num, objstm_members.index(num)))
        elif num == xref_num:
            rows.append((1, 0, 0))  # patched below
        else:
            rows.append((0, 0, 0))
    xref_off = out.tell()
    rows[xref_num] = (1, xref_off, 0)
    body = b""
    for t, a, b_ in rows:
        body += bytes([t]) + a.to_bytes(4, "big") + b_.to_bytes(2, "big")
    zbody = zlib.compress(body)
    out.write(b"%d 0 obj\n" % xref_num)
    out.write(b"<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
              b"/Filter /FlateDecode /Length %d >>\nstream\n"
              % (max_num + 1, len(zbody)))
    out.write(zbody)
    out.write(b"\nendstream\nendobj\n")
    out.write(b"startxref\n%d\n%%%%EOF\n" % xref_off)
    with open(path, "wb") as f:
        f.write(out.getvalue())
