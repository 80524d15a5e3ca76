"""Posting-list compression: delta-gapped varbyte blocks with block-max
metadata.

This is our native replacement for the packed posting format Lucene hides
behind the reference's Elasticsearch index (extractor/loader.go:114-136).

Layout per block (<= ``BLOCK_SIZE`` postings, a few hundred bytes — cheap to
move through Arrow as a BinaryType cell):

* ``doc_gaps`` — varbyte(first_doc_id, then deltas between consecutive ids)
* ``tfs``      — varbyte(term frequencies, same order)
* ``dls``      — varbyte(document lengths, same order; needed for rescoring)
* ``n_docs``, ``max_doc_id``, ``block_max_tf``, ``block_min_dl``,
  ``block_max_score`` — block-max WAND skip metadata.

Varbyte: classic 7-bit groups, MSB continuation bit (little-endian groups).
"""

from __future__ import annotations

from dataclasses import dataclass

BLOCK_SIZE = 128


def vb_encode(values: list[int]) -> bytes:
    out = bytearray()
    for v in values:
        if v < 0:
            raise ValueError(f"varbyte requires non-negative ints, got {v}")
        while True:
            byte = v & 0x7F
            v >>= 7
            if v:
                out.append(byte | 0x80)
            else:
                out.append(byte)
                break
    return bytes(out)


def vb_decode(data: bytes) -> list[int]:
    out: list[int] = []
    cur = 0
    shift = 0
    for byte in data:
        cur |= (byte & 0x7F) << shift
        if byte & 0x80:
            shift += 7
        else:
            out.append(cur)
            cur = 0
            shift = 0
    if shift:
        raise ValueError("truncated varbyte stream")
    return out


def delta_encode(sorted_ids: list[int]) -> list[int]:
    if not sorted_ids:
        return []
    gaps = [sorted_ids[0]]
    prev = sorted_ids[0]
    for v in sorted_ids[1:]:
        if v <= prev:
            raise ValueError("doc ids must be strictly increasing")
        gaps.append(v - prev)
        prev = v
    return gaps


def delta_decode(gaps: list[int]) -> list[int]:
    out: list[int] = []
    acc = 0
    for i, g in enumerate(gaps):
        acc = g if i == 0 else acc + g
        out.append(acc)
    return out


@dataclass
class PostingBlock:
    """One decoded posting block (doc ids strictly increasing)."""

    doc_ids: list[int]
    tfs: list[int]
    dls: list[int]

    def encode(self) -> tuple[bytes, bytes, bytes]:
        return (
            vb_encode(delta_encode(self.doc_ids)),
            vb_encode(self.tfs),
            vb_encode(self.dls),
        )

    @staticmethod
    def decode(doc_gaps: bytes, tfs: bytes, dls: bytes) -> "PostingBlock":
        return PostingBlock(
            doc_ids=delta_decode(vb_decode(doc_gaps)),
            tfs=vb_decode(tfs),
            dls=vb_decode(dls),
        )


def encode_positions(pos_lists: list[list[int]]) -> bytes:
    """Concatenated per-doc position lists, each delta-encoded (positions
    are strictly increasing 0-based token indexes within a doc), then one
    varbyte stream. Per-doc boundaries are NOT stored — the tf list of
    the same block gives the counts (len(pos_lists[i]) == tfs[i]), so
    positions ride as a single extra binary cell next to the postings."""
    flat: list[int] = []
    for pl in pos_lists:
        flat.extend(delta_encode(pl))
    return vb_encode(flat)


def decode_positions(blob: bytes, tfs: list[int]) -> list[list[int]]:
    """Inverse of :func:`encode_positions` given the block's tf list."""
    vals = vb_decode(blob)
    out: list[list[int]] = []
    i = 0
    for tf in tfs:
        out.append(delta_decode(vals[i : i + tf]))
        i += tf
    if i != len(vals):
        raise ValueError("position stream length mismatch vs tf counts")
    return out


def chunk_postings(
    doc_ids: list[int], tfs: list[int], dls: list[int], block_size: int = BLOCK_SIZE
) -> list[PostingBlock]:
    """Split one term's postings (sorted by doc_id) into encode-ready blocks."""
    return [
        PostingBlock(
            doc_ids[i : i + block_size],
            tfs[i : i + block_size],
            dls[i : i + block_size],
        )
        for i in range(0, len(doc_ids), block_size)
    ]
