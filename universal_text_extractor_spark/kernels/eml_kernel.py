"""EML email extraction kernel (K7, SURVEY.md §2.3).

Reference semantics (reference utils/file_handlers.py:1146-1229):

- header block ``From:/To:/Subject:/Date:`` with ``Unknown`` / ``No Subject``
  defaults (reference :1169-1174), followed by a blank line
- multipart walk skipping attachments (Content-Disposition contains
  ``attachment``, reference :1181-1185)
- text/plain parts preferred; text/html used only when no plain body yet
  (reference :1199-1201), html stripped via get_text('\\n') semantics
- charset-aware decode with utf-8/replace fallback (reference :1190-1197)

Uses the CPython stdlib ``email`` package (same as the reference).
"""

from __future__ import annotations

import email as _email

from .html_kernel import _walk as _html_walk


def _html_to_text(html_content: str) -> str:
    """bs4 ``get_text(separator='\\n')`` semantics — NO whitespace chunking
    (the reference eml path skips the cleanup used for standalone HTML,
    reference utils/file_handlers.py:1216)."""
    _, texts = _html_walk(html_content)
    return "\n".join(texts)


def _decode_part(payload: bytes, charset: str | None) -> str:
    if charset:
        try:
            return payload.decode(charset)
        except (UnicodeDecodeError, LookupError):
            return payload.decode("utf-8", errors="replace")
    return payload.decode("utf-8", errors="replace")


def extract_eml(src: str) -> tuple[str, list[str]]:
    """Returns (text, logs). Never raises."""
    logs = ["Extracting text from EML file"]
    try:
        msg = _email.message_from_string(src)
        headers = (
            f"From: {msg.get('From', 'Unknown')}\n"
            f"To: {msg.get('To', 'Unknown')}\n"
            f"Subject: {msg.get('Subject', 'No Subject')}\n"
            f"Date: {msg.get('Date', 'Unknown')}\n\n"
        )
        body = ""
        if msg.is_multipart():
            for part in msg.walk():
                content_type = part.get_content_type()
                content_disp = str(part.get("Content-Disposition"))
                if "attachment" in content_disp:
                    continue
                if content_type == "text/plain":
                    payload = part.get_payload(decode=True)
                    if payload is not None:
                        body += _decode_part(payload, part.get_content_charset())
                elif content_type == "text/html" and not body:
                    payload = part.get_payload(decode=True)
                    if payload is not None:
                        body += _html_to_text(
                            _decode_part(payload, part.get_content_charset())
                        )
        else:
            payload = msg.get_payload(decode=True)
            body = (payload or b"").decode("utf-8", errors="replace")
        logs.append("Successfully extracted text from EML file")
        return headers + body, logs
    except Exception as e:
        logs.append(f"EML extraction failed: {e}")
        return f"[Error extracting EML text: {e}]", logs
