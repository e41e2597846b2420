"""Deterministic cuckoo filter — the delete-capable fallback for the
URL-seen set (north_star: "bloom/cuckoo URL-seen set, cuckoo fallback
for deletes", e.g. for recrawl policies that expire entries).

Standard (2,4)-cuckoo: two candidate buckets of 4 slots, 16-bit
fingerprints, partial-key cuckoo kicking with a deterministic kick
sequence (seeded by the insertion counter, not random state) so runs
are reproducible.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np


class CuckooFilter:
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.1:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_items = 0
        self._kick_counter = 0

    @staticmethod
    def _hash(item: str) -> tuple[int, int]:
        d = hashlib.blake2b(item.encode(), digest_size=16).digest()
        h, f = struct.unpack("<QQ", d)
        fp = (f & 0xFFFF) or 1  # fingerprint 0 means empty slot
        return h, fp

    def _buckets(self, h: int, fp: int) -> tuple[int, int]:
        i1 = h % self.n_buckets
        # alt bucket: xor with a deterministic hash of the fingerprint
        fph = struct.unpack(
            "<Q", hashlib.blake2b(struct.pack("<H", fp), digest_size=8).digest()
        )[0]
        i2 = (i1 ^ fph) % self.n_buckets
        return i1, i2

    def add(self, item: str) -> bool:
        h, fp = self._hash(item)
        i1, i2 = self._buckets(h, fp)
        for i in (i1, i2):
            row = self.table[i]
            for s in range(self.SLOTS):
                if row[s] == 0:
                    row[s] = fp
                    self.n_items += 1
                    return True
        # kick deterministically
        i = i1 if (self._kick_counter % 2 == 0) else i2
        cur_fp = fp
        for kick in range(self.MAX_KICKS):
            self._kick_counter += 1
            s = self._kick_counter % self.SLOTS
            cur_fp, self.table[i][s] = int(self.table[i][s]), cur_fp
            _, alt = self._buckets_for_fp(i, cur_fp)
            i = alt
            row = self.table[i]
            for s2 in range(self.SLOTS):
                if row[s2] == 0:
                    row[s2] = cur_fp
                    self.n_items += 1
                    return True
        raise RuntimeError("cuckoo filter full")

    def _buckets_for_fp(self, i: int, fp: int) -> tuple[int, int]:
        fph = struct.unpack(
            "<Q", hashlib.blake2b(struct.pack("<H", fp), digest_size=8).digest()
        )[0]
        return i, (i ^ fph) % self.n_buckets

    def __contains__(self, item: str) -> bool:
        h, fp = self._hash(item)
        i1, i2 = self._buckets(h, fp)
        return fp in self.table[i1] or fp in self.table[i2]

    def delete(self, item: str) -> bool:
        h, fp = self._hash(item)
        i1, i2 = self._buckets(h, fp)
        for i in (i1, i2):
            row = self.table[i]
            for s in range(self.SLOTS):
                if row[s] == fp:
                    row[s] = 0
                    self.n_items -= 1
                    return True
        return False

    def to_bytes(self) -> bytes:
        header = struct.pack("<QQQ", self.n_buckets, self.n_items, self._kick_counter)
        return header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        n_buckets, n_items, kick = struct.unpack("<QQQ", data[:24])
        obj = cls.__new__(cls)
        obj.n_buckets = n_buckets
        obj.n_items = n_items
        obj._kick_counter = kick
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        )
        return obj
