"""Implicit kd-tree (kdbush-compatible), vectorized numpy.

From-scratch implementation matching the reference's semantics
(reference src/kdtree/builder.rs:102-244, src/kdtree/trait.rs:37-174):
coords are recursively median-partitioned alternating x/y axes down to
``node_size`` blocks; ``range`` and ``within`` use inclusive bounds
(``x >= min_x && x <= max_x``; ``sq_dist <= r*r``).

Median selection uses ``np.argpartition`` (introselect — the same
O(n) selection family as the reference's Floyd–Rivest). Tie placement
may differ from the reference, so parity is at the *result-set* level
(the reference's own cross-checks are set-based,
src/kdtree/test.rs:183-201).

Serialization follows kdbush ABI v1
``[8B header][ids u16|u32][pad to 8][x,y interleaved]`` with header
``0xdb, (1<<4)+type_index, node_size:u16, num_items:u32``
(reference src/kdtree/index.rs:114-141).
"""

from __future__ import annotations

import numpy as np

DEFAULT_NODE_SIZE = 64  # reference src/kdtree/builder.rs:15
_VERSION = 1
_TYPE_INDEX = {np.dtype("f8"): 8, np.dtype("f4"): 7}


class KDBush:
    def __init__(self, points: np.ndarray, node_size: int = DEFAULT_NODE_SIZE, dtype=np.float64):
        pts = np.ascontiguousarray(points, dtype=dtype).reshape(-1, 2)
        self.num_items = n = pts.shape[0]
        self.node_size = node_size
        self.dtype = np.dtype(dtype)
        ids = np.arange(n, dtype=np.int64)
        self.coords = pts.copy()
        self.ids = ids
        if n > node_size:
            self._kd_sort(0, n - 1, 0)

    def _kd_sort(self, left: int, right: int, axis: int) -> None:
        """Iterative median-split kd ordering (semantics of reference
        src/kdtree/builder.rs:150-237, selection via introselect)."""
        stack = [(left, right, axis)]
        c, ids = self.coords, self.ids
        ns = self.node_size
        while stack:
            lo, hi, ax = stack.pop()
            if hi - lo <= ns:
                continue
            m = (lo + hi) >> 1
            seg = slice(lo, hi + 1)
            ord_rel = np.argpartition(c[seg, ax], m - lo)
            c[seg] = c[seg][ord_rel]
            ids[seg] = ids[seg][ord_rel]
            stack.append((lo, m - 1, 1 - ax))
            stack.append((m + 1, hi, 1 - ax))

    # -- queries (vectorized block-pruned scans) -----------------------------

    def range(self, min_x: float, min_y: float, max_x: float, max_y: float) -> np.ndarray:
        """Ids with min<=coord<=max on both axes (inclusive; reference
        src/kdtree/trait.rs:37-97). Recursive axis pruning."""
        n = self.num_items
        if n == 0:
            return np.empty(0, dtype=np.int64)
        out: list[np.ndarray] = []
        c, ids, ns = self.coords, self.ids, self.node_size
        stack = [(0, n - 1, 0)]
        while stack:
            lo, hi, ax = stack.pop()
            if hi - lo <= ns:
                blk = c[lo : hi + 1]
                m = (
                    (blk[:, 0] >= min_x)
                    & (blk[:, 0] <= max_x)
                    & (blk[:, 1] >= min_y)
                    & (blk[:, 1] <= max_y)
                )
                out.append(ids[lo : hi + 1][m])
                continue
            m = (lo + hi) >> 1
            x, y = c[m, 0], c[m, 1]
            if min_x <= x <= max_x and min_y <= y <= max_y:
                out.append(ids[m : m + 1])
            lov, hiv = (min_x, max_x) if ax == 0 else (min_y, max_y)
            v = x if ax == 0 else y
            if lov <= v:
                stack.append((lo, m - 1, 1 - ax))
            if hiv >= v:
                stack.append((m + 1, hi, 1 - ax))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    def within(self, qx: float, qy: float, r: float) -> np.ndarray:
        """Ids with squared distance <= r^2 (inclusive; reference
        src/kdtree/trait.rs:118-174)."""
        n = self.num_items
        if n == 0:
            return np.empty(0, dtype=np.int64)
        r2 = r * r
        out: list[np.ndarray] = []
        c, ids, ns = self.coords, self.ids, self.node_size
        stack = [(0, n - 1, 0)]
        while stack:
            lo, hi, ax = stack.pop()
            if hi - lo <= ns:
                blk = c[lo : hi + 1]
                d2 = (blk[:, 0] - qx) ** 2 + (blk[:, 1] - qy) ** 2
                out.append(ids[lo : hi + 1][d2 <= r2])
                continue
            m = (lo + hi) >> 1
            x, y = c[m, 0], c[m, 1]
            if (x - qx) ** 2 + (y - qy) ** 2 <= r2:
                out.append(ids[m : m + 1])
            v = x if ax == 0 else y
            q = qx if ax == 0 else qy
            if q - r <= v:
                stack.append((lo, m - 1, 1 - ax))
            if q + r >= v:
                stack.append((m + 1, hi, 1 - ax))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    # -- serialization (kdbush ABI v1) ----------------------------------------

    def to_bytes(self) -> bytes:
        idx_dtype = np.uint16 if self.num_items < 65536 else np.uint32
        header = np.zeros(8, dtype=np.uint8)
        header[0] = 0xDB
        header[1] = (_VERSION << 4) + _TYPE_INDEX[self.dtype]
        header[2:4] = np.frombuffer(np.uint16(self.node_size).tobytes(), dtype=np.uint8)
        header[4:8] = np.frombuffer(np.uint32(self.num_items).tobytes(), dtype=np.uint8)
        ids_b = self.ids.astype(idx_dtype).tobytes()
        pad = (-(8 + len(ids_b))) % 8  # align coords to 8 (reference src/kdtree/index.rs:32)
        return header.tobytes() + ids_b + b"\x00" * pad + self.coords.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KDBush":
        raw = np.frombuffer(buf, dtype=np.uint8)
        if raw[0] != 0xDB:
            raise ValueError("not a kdbush buffer (bad magic)")
        version, type_index = raw[1] >> 4, raw[1] & 0x0F
        if version != _VERSION:
            raise ValueError(f"unsupported kdbush version {version}")
        dtype = {8: np.dtype("f8"), 7: np.dtype("f4")}[int(type_index)]
        node_size = int(np.frombuffer(buf[2:4], dtype=np.uint16)[0])
        num_items = int(np.frombuffer(buf[4:8], dtype=np.uint32)[0])
        idx_dtype = np.uint16 if num_items < 65536 else np.uint32
        ids_len = num_items * idx_dtype().itemsize
        pad = (-(8 + ids_len)) % 8
        coords_off = 8 + ids_len + pad
        obj = cls.__new__(cls)
        obj.num_items = num_items
        obj.node_size = node_size
        obj.dtype = dtype
        obj.ids = np.frombuffer(buf[8 : 8 + ids_len], dtype=idx_dtype).astype(np.int64)
        obj.coords = (
            np.frombuffer(buf[coords_off : coords_off + num_items * 2 * dtype.itemsize], dtype=dtype)
            .reshape(-1, 2)
            .copy()
        )
        return obj
