"""XML extraction kernel (K3, SURVEY.md §2.3).

Reproduces the reference XML walk (reference utils/file_handlers.py:979-1044):
recursive element walk emitting indented pseudo-XML — open tag with attrs,
stripped text content, children, close tag — joined with newlines; on parse
failure, the regex floor ``>([^<]+)<`` (reference :1035).

Uses the CPython-stdlib ElementTree parser (the same parser family the
reference uses; deterministic, attribute order preserved since 3.8) — no
third-party dependency, so bytes depend only on this module + stdlib.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET


def _walk(element: ET.Element, indent: int, out: list[str]) -> None:
    # mirrors reference utils/file_handlers.py:999-1018
    indent_str = "  " * indent
    attribs = "" if not element.attrib else " " + " ".join(
        f"{k}='{v}'" for k, v in element.attrib.items()
    )
    out.append(f"{indent_str}<{element.tag}{attribs}>")
    if element.text and element.text.strip():
        out.append(f"{indent_str}  {element.text.strip()}")
    for child in element:
        _walk(child, indent + 1, out)
    out.append(f"{indent_str}</{element.tag}>")


def extract_xml(src: str) -> tuple[str, list[str]]:
    """Returns (text, logs). Never raises."""
    logs: list[str] = []
    try:
        logs.append("Extracting text from XML")
        root = ET.fromstring(src)
        parts: list[str] = []
        _walk(root, 0, parts)
        logs.append("Successfully extracted text from XML")
        return "\n".join(parts), logs
    except Exception as e:
        logs.append(f"XML extraction failed: {e}")
        try:
            # fallback regex, reference utils/file_handlers.py:1035-1036
            text_parts = re.findall(r">([^<]+)<", src)
            logs.append("Used fallback method for XML extraction")
            return "\n".join(p.strip() for p in text_parts if p.strip()), logs
        except Exception as fallback_e:
            logs.append(f"Fallback XML extraction also failed: {fallback_e}")
            return f"[Error extracting XML text: {e}]", logs
