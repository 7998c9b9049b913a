"""CSV extraction kernel (K6, CSV path; SURVEY.md §2.3).

Reference semantics (reference utils/file_handlers.py:792-804): parse rows
with a quote-aware splitter, join each row's cells with ``" | "``, one row
per line with trailing newline. From-scratch splitter (RFC-4180-ish:
double-quote quoting, ``""`` escape, embedded newlines inside quotes).
"""

from __future__ import annotations


def _parse_rows(src: str) -> list[list[str]]:
    rows: list[list[str]] = []
    field: list[str] = []
    row: list[str] = []
    i, n = 0, len(src)
    in_quotes = False
    while i < n:
        ch = src[i]
        if in_quotes:
            if ch == '"':
                if i + 1 < n and src[i + 1] == '"':
                    field.append('"')
                    i += 2
                    continue
                in_quotes = False
            else:
                field.append(ch)
            i += 1
            continue
        if ch == '"' and not field:
            in_quotes = True
        elif ch == ",":
            row.append("".join(field))
            field = []
        elif ch == "\r":
            if i + 1 < n and src[i + 1] == "\n":
                i += 1
            row.append("".join(field))
            rows.append(row)
            field, row = [], []
        elif ch == "\n":
            row.append("".join(field))
            rows.append(row)
            field, row = [], []
        else:
            field.append(ch)
        i += 1
    if field or row:
        row.append("".join(field))
        rows.append(row)
    return rows


def extract_csv(src: str) -> tuple[str, list[str]]:
    """Returns (text, logs). Never raises on str input."""
    logs = ["Processing CSV file"]
    rows = _parse_rows(src)
    # reference utils/file_handlers.py:800-801
    text = "".join(" | ".join(r) + "\n" for r in rows)
    logs.append("Successfully extracted data from CSV")
    return text, logs
