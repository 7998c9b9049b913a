"""Legacy binary Office text extraction: Word 97 ``.doc`` ([MS-DOC]) and
PowerPoint 97 ``.ppt`` ([MS-PPT]) over the shared CFB reader.

BEYOND the reference: the reference declines both formats with an
informative literal (``utils/file_handlers.py:601`` for .doc, ``:769`` for
.ppt — "Legacy ... format detected, limited extraction support"), so the
default dispatch path keeps those literals for observable parity. These
real parsers are opt-in via ``legacy_office=True`` (same default-off
pattern as ``main_content``); at crawl scale legacy Office binaries are a
real share of document payloads, and a training pipeline wants their text.

Spec implementations, independent of the pages-generator writers
(``sources/pages_gen.py::make_doc/make_ppt`` build the same structures
from the other direction; round-trips are the oracle):

- .doc: FIB (wIdent A5EC, nFib, fWhichTblStm bit) → Clx in the 0Table/
  1Table stream → Pcdt piece table (PlcPcd: CP array + PCDs); each piece
  is either "compressed" 8-bit text (fc bit 30 set → byte offset fc/2,
  Windows-1252 — the [MS-DOC] compressed-byte remap table IS the cp1252
  high range) or UTF-16LE at fc. Main-document text = the first ccpText
  characters (FibRgLw97 ccpText, FIB offset 0x4C).
- .ppt: record walk over the "PowerPoint Document" stream (8-byte record
  headers; recVer 0xF = container, recurse). SlidePersistAtom (0x03F3)
  opens a new ``--- Slide N ---`` frame (the [MS-PPT] SlideListWithText
  layout); TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
  high-byte-dropped UTF-16 ≡ cp1252) carry the text wherever they appear
  (SlideListWithText or OfficeArtClientTextbox).
"""

from __future__ import annotations

from .cfb import CfbFile, _u16, _u32

# [MS-DOC] FIB offsets (nFib 0x00C1, Word 97 layout)
_FIB_WIDENT = 0xA5EC
_OFF_FLAGS = 0x000A  # FibBase flag word; bit 9 = fWhichTblStm
_OFF_CCPTEXT = 0x004C  # FibRgLw97.ccpText
_OFF_FCCLX = 0x01A2  # FibRgFcLcb97.fcClx
_OFF_LCBCLX = 0x01A6  # FibRgFcLcb97.lcbClx

# Word text-stream control characters → plain-text equivalents
_DOC_CHAR_MAP = {
    0x0D: "\n",  # paragraph mark
    0x0B: "\n",  # hard line break
    0x07: "\n",  # cell / row mark
    0x0C: "\n",  # page break / section mark
    0x1E: "-",  # non-breaking hyphen
    0x1F: "",  # optional hyphen
    0xA0: " ",  # non-breaking space (after decode)
    0x13: "",  # field begin
    0x14: "",  # field separator
    0x15: "",  # field end
    0x01: "",  # embedded object anchor
    0x08: "",  # drawn-object anchor
    0x05: "",  # annotation reference
    0x02: "",  # footnote reference
}


def _doc_clean(s: str) -> str:
    out = "".join(_DOC_CHAR_MAP.get(ord(c), c) for c in s)
    lines = [ln.rstrip() for ln in out.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_doc(payload: bytes) -> tuple[str, list[str]]:
    """Word 97 binary text via the FIB → Clx → PlcPcd piece walk."""
    logs: list[str] = []
    cfb = CfbFile(payload)
    word = cfb.stream("WordDocument")
    if len(word) < 0x01AA or _u16(word, 0) != _FIB_WIDENT:
        raise ValueError("not a Word binary document (bad FIB ident)")
    flags = _u16(word, _OFF_FLAGS)
    which = (flags >> 9) & 1
    table = cfb.stream(f"{which}Table", f"{1 - which}Table")
    ccp_text = _u32(word, _OFF_CCPTEXT)
    fc_clx = _u32(word, _OFF_FCCLX)
    lcb_clx = _u32(word, _OFF_LCBCLX)
    clx = table[fc_clx : fc_clx + lcb_clx]
    # Clx = RgPrc (clxt=1 entries: 1 + 2-byte cbGrpprl + data) then Pcdt
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:
        pos += 3 + _u16(clx, pos + 1)
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("piece table (Pcdt) not found in Clx")
    lcb = _u32(clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) < lcb or (lcb - 4) % 12:
        raise ValueError("malformed PlcPcd")
    n = (lcb - 4) // 12
    cps = [_u32(plc, i * 4) for i in range(n + 1)]
    chunks: list[str] = []
    remaining = ccp_text
    for i in range(n):
        if remaining <= 0:
            break
        pcd = (n + 1) * 4 + i * 8
        fc_raw = _u32(plc, pcd + 2)
        ncp = min(cps[i + 1] - cps[i], remaining)
        if ncp < 0:
            raise ValueError("non-monotonic piece CPs")
        if fc_raw & 0x40000000:  # fCompressed: 8-bit text at fc/2
            fc = (fc_raw & 0x3FFFFFFF) // 2
            chunks.append(word[fc : fc + ncp].decode("cp1252", errors="replace"))
        else:
            fc = fc_raw & 0x3FFFFFFF
            chunks.append(
                word[fc : fc + 2 * ncp].decode("utf-16-le", errors="replace")
            )
        remaining -= ncp
    text = _doc_clean("".join(chunks))
    logs.append(
        f"Extracted text from legacy DOC ({n} piece(s), {ccp_text} chars)"
    )
    return text, logs


# [MS-PPT] record types
_RT_SLIDE_PERSIST_ATOM = 0x03F3
_RT_TEXT_CHARS_ATOM = 0x0FA0
_RT_TEXT_BYTES_ATOM = 0x0FA8


def _ppt_walk(data: bytes, parts: list[str], state: dict) -> None:
    pos = 0
    while pos + 8 <= len(data):
        ver_inst = _u16(data, pos)
        rtype = _u16(data, pos + 2)
        rlen = _u32(data, pos + 4)
        body = data[pos + 8 : pos + 8 + rlen]
        if ver_inst & 0xF == 0xF:
            _ppt_walk(body, parts, state)
        elif rtype == _RT_SLIDE_PERSIST_ATOM:
            state["slide"] += 1
            parts.append(f"--- Slide {state['slide']} ---")
        elif rtype == _RT_TEXT_CHARS_ATOM:
            state["atoms"] += 1
            parts.append(
                body.decode("utf-16-le", errors="replace").replace("\r", "\n")
            )
        elif rtype == _RT_TEXT_BYTES_ATOM:
            state["atoms"] += 1
            parts.append(body.decode("cp1252", errors="replace").replace("\r", "\n"))
        pos += 8 + rlen


def extract_ppt(payload: bytes) -> tuple[str, list[str]]:
    """PowerPoint 97 binary text via the record walk."""
    logs: list[str] = []
    stream = CfbFile(payload).stream("PowerPoint Document")
    parts: list[str] = []
    state = {"slide": 0, "atoms": 0}
    _ppt_walk(stream, parts, state)
    text = "\n".join(p.rstrip() for p in parts if p.strip())
    logs.append(
        f"Extracted text from legacy PPT "
        f"({state['slide']} slide(s), {state['atoms']} text atom(s))"
    )
    return text, logs
