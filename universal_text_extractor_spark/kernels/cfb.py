"""OLE2 / Compound File Binary reader shared by the legacy-Office kernels
(.xls BIFF8 workbooks, .msg MAPI messages). Hand-rolled from the public
[MS-CFB] layout — no libraries.

Supports CFB v3: FAT sectors addressed by the header's 109 DIFAT slots
(≈6.8 MB of FAT coverage — synthetic pages and real crawl-payload office
files sit far below), regular FAT streams AND the mini-stream (miniFAT
chains of 64-byte sectors inside the root entry's stream — where .msg
property streams live). DIFAT chains raise; every raise is contained by
the calling kernel's literal fallback.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


class CfbFile:
    """Parsed container: ``streams`` maps stream name → bytes."""

    def __init__(self, payload: bytes):
        if len(payload) < 512 or payload[:8] != CFB_MAGIC:
            raise ValueError("not an OLE2 compound file")
        major = _u16(payload, 26)
        if major not in (3, 4):
            raise ValueError(f"unsupported CFB major version {major}")
        ssz = 1 << _u16(payload, 30)
        if (major, ssz) not in ((3, 512), (4, 4096)):
            raise ValueError(f"CFB v{major} with sector size {ssz}")
        mini_ssz = 1 << _u16(payload, 32)
        num_fat = _u32(payload, 44)
        first_dir = _u32(payload, 48)
        self.mini_cutoff = _u32(payload, 56)
        first_minifat = _u32(payload, 60)
        num_minifat = _u32(payload, 64)
        first_difat = _u32(payload, 68)
        if first_difat not in (ENDOFCHAIN, FREESECT, 0):
            raise ValueError("DIFAT chains not supported")

        def sector(n: int) -> bytes:
            # [MS-CFB]: sector #n starts at (n+1)*sector_size — the header
            # occupies the whole first sector (512 bytes padded to 4096 in
            # v4; the old 512 + n*ssz form was v3-only, r5 review batch 4)
            off = (n + 1) * ssz
            if off + ssz > len(payload):
                raise ValueError(f"sector {n} out of range")
            return payload[off : off + ssz]

        fat: list[int] = []
        for i in range(min(num_fat, 109)):
            s = _u32(payload, 76 + 4 * i)
            if s in (FREESECT, ENDOFCHAIN):
                break
            fat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

        def chain(start: int, table: list[int]) -> list[int]:
            out, cur = [], start
            while cur not in (ENDOFCHAIN, FREESECT):
                if cur >= len(table) or len(out) > len(table):
                    raise ValueError("broken chain")
                out.append(cur)
                cur = table[cur]
            return out

        minifat: list[int] = []
        if num_minifat and first_minifat not in (ENDOFCHAIN, FREESECT):
            for s in chain(first_minifat, fat):
                minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))

        dirdata = b"".join(sector(s) for s in chain(first_dir, fat))
        raw = []  # id-aligned: (name, obj_type, left, right, child, start, size)
        for off in range(0, len(dirdata) - 127, 128):
            obj_type = dirdata[off + 66]
            name_len = _u16(dirdata, off + 64)
            name = ""
            if 2 <= name_len <= 64:
                name = dirdata[off : off + name_len - 2].decode(
                    "utf-16-le", "replace"
                )
            raw.append(
                (
                    name,
                    obj_type,
                    _u32(dirdata, off + 68),
                    _u32(dirdata, off + 72),
                    _u32(dirdata, off + 76),
                    _u32(dirdata, off + 116),
                    _u32(dirdata, off + 120),
                )
            )

        # Streams under NON-root storages (e.g. a .msg attachment's
        # embedded-message storage) must NOT land in the flat name dict:
        # real Outlook files repeat __substg property names inside
        # attachment storages, and a flat last-wins walk let a nested
        # subject/body CLOBBER the top-level one (r5 review, batch 4).
        # Walk each non-root storage's child subtree (left/right are
        # red-black siblings, child descends a level) and exclude it.
        NOSTREAM = 0xFFFFFFFF
        nested: set[int] = set()
        root_idx = next((i for i, e in enumerate(raw) if e[1] == 5), None)
        for i, e in enumerate(raw):
            if e[1] == 1 and i != root_idx:  # non-root storage
                stack, hops = [e[4]], 0
                while stack:
                    j = stack.pop()
                    hops += 1
                    if j == NOSTREAM or j >= len(raw) or j in nested or hops > len(raw) * 4:
                        continue
                    nested.add(j)
                    stack.extend((raw[j][2], raw[j][3], raw[j][4]))

        entries = [
            (e[0], e[1], e[5], e[6])
            for i, e in enumerate(raw)
            if e[1] in (2, 5) and e[0] and i not in nested
        ]

        roots = [e for e in entries if e[1] == 5]
        ministream = b""
        if roots and roots[0][2] not in (ENDOFCHAIN, FREESECT):
            _, _, mstart, msize = roots[0]
            ministream = b"".join(sector(s) for s in chain(mstart, fat))[:msize]

        self.streams: dict[str, bytes] = {}
        for name, obj_type, start, size in entries:
            if obj_type != 2:
                continue
            if size >= self.mini_cutoff:
                data = b"".join(sector(s) for s in chain(start, fat))[:size]
            else:
                parts = []
                for ms in chain(start, minifat):
                    off = ms * mini_ssz
                    parts.append(ministream[off : off + mini_ssz])
                data = b"".join(parts)[:size]
            self.streams[name] = data

    def stream(self, *names: str) -> bytes:
        for n in names:
            if n in self.streams:
                return self.streams[n]
        raise ValueError(f"no stream named {names}")
