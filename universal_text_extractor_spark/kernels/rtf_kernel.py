"""RTF extraction kernel (K5, SURVEY.md §2.3).

A from-scratch RTF control-word state machine. The reference uses
``striprtf`` with a regex floor (reference utils/file_handlers.py:880-924);
the floor regex ``\\\\[a-z0-9]+(-?[0-9]+)?[ ]?|\\{|\\}|\\\\`` (reference
:915) defines the minimum semantics. This kernel does better (real group /
destination / escape handling) and is locked by goldens.
"""

from __future__ import annotations

import re

# Destinations whose content never contributes body text.
_SKIP_DESTINATIONS = frozenset((
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header", "footer",
    "themedata", "colorschememapping", "generator", "listtable",
    "listoverridetable", "latentstyles", "rsidtbl", "xmlnstbl",
))
_CW_RE = re.compile(r"\\([a-z]{1,32})(-?\d{1,10})? ?|\\([^a-z])", re.IGNORECASE)

_NEWLINE_WORDS = frozenset(("par", "line", "row"))
_TAB_WORDS = frozenset(("tab", "cell"))


def extract_rtf(src: str) -> tuple[str, list[str]]:
    """Returns (text, logs). Never raises."""
    logs = ["Extracting text from RTF using control-word state machine"]
    try:
        out: list[str] = []
        stack: list[bool] = []  # skip-state per open group
        skip = False
        i, n = 0, len(src)
        pending_uc_skip = 0
        while i < n:
            ch = src[i]
            if ch == "{":
                stack.append(skip)
                i += 1
                continue
            if ch == "}":
                skip = stack.pop() if stack else False
                i += 1
                continue
            if ch == "\\":
                m = _CW_RE.match(src, i)
                if not m:
                    i += 1
                    continue
                if m.group(3) is not None:  # control symbol
                    sym = m.group(3)
                    if not skip:
                        if sym in "\\{}":
                            out.append(sym)
                        elif sym == "~":
                            out.append("\u00a0")
                        elif sym == "'":
                            hexpair = src[m.end() : m.end() + 2]
                            # a \'hh directly after \uN is the ANSI
                            # fallback for that unicode char (Word emits
                            # one for every non-Latin char) — it must be
                            # CONSUMED by the pending skip, not emitted
                            # alongside (r5 review, batch 4)
                            if pending_uc_skip:
                                pending_uc_skip -= 1
                            else:
                                try:
                                    out.append(bytes([int(hexpair, 16)]).decode("windows-1252"))
                                except Exception:
                                    pass
                            i = m.end() + 2
                            continue
                        elif sym == "*":
                            skip = True  # \* destination: skip unless known
                    i = m.end()
                    continue
                word, param = m.group(1), m.group(2)
                if word in _SKIP_DESTINATIONS:
                    skip = True
                elif not skip:
                    if word in _NEWLINE_WORDS:
                        out.append("\n")
                    elif word in _TAB_WORDS:
                        out.append("\t")
                    elif word == "u" and param is not None:
                        code = int(param)
                        out.append(chr(code + 65536 if code < 0 else code))
                        pending_uc_skip = 1
                i = m.end()
                continue
            if ch in "\r\n":
                i += 1
                continue
            if not skip:
                if pending_uc_skip:
                    pending_uc_skip -= 1
                else:
                    out.append(ch)
            i += 1
        text = "".join(out).strip()
        logs.append("Successfully extracted text from RTF")
        return text, logs
    except Exception as e:
        logs.append(f"RTF extraction failed: {e}")
        # regex floor, reference utils/file_handlers.py:915-917
        text = re.sub(r"\\[a-z0-9]+(-?[0-9]+)?[ ]?|\{|\}|\\", " ", src)
        return re.sub(r"\s+", " ", text).strip(), logs
