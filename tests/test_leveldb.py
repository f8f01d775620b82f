"""LevelDB read path (data/leveldb.py) — the reference's second DB backend
(src/caffe/util/db.cpp, db_leveldb.cpp).

The fixture writer below emits REAL LevelDB directories byte-for-byte in the
public on-disk formats (CURRENT + MANIFEST VersionEdits in log format,
WriteBatch WALs, block-based .ldb tables with restart arrays, footers, and
masked CRC32Cs) so the reader is validated against the format spec, not
against itself. Snappy streams are validated against hand-assembled tag
sequences plus a literal-only encoder round-trip.
"""

import os
import struct

import numpy as np
import pytest

from flownet2_tpu.data.leveldb import (
    LOG_BLOCK_SIZE,
    TABLE_MAGIC,
    LevelDBError,
    LevelDBFlowDataset,
    LevelDBReader,
    _crc32c,
    snappy_decompress,
)

from test_lmdb import make_flow_datum


# -- fixture writer (formats per the public LevelDB spec) --------------------


def _mask_crc(crc):
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _prefixed(b):
    return _varint(len(b)) + b


def write_log_file(path, records):
    """LevelDB log format: 32 KiB blocks of [masked-crc u32][len u16][type u8]
    fragments; records split across blocks with FIRST/MIDDLE/LAST."""
    buf = bytearray()
    for rec in records:
        pos = 0
        first = True
        while True:
            room = LOG_BLOCK_SIZE - (len(buf) % LOG_BLOCK_SIZE)
            if room < 7:
                buf += b"\x00" * room
                continue
            avail = room - 7
            frag = rec[pos : pos + avail]
            pos += len(frag)
            last = pos >= len(rec)
            rtype = 1 if (first and last) else 2 if first else 4 if last else 3
            crc = _mask_crc(_crc32c(bytes((rtype,)) + frag))
            buf += struct.pack("<IHB", crc, len(frag), rtype) + frag
            first = False
            if last:
                break
    with open(path, "wb") as f:
        f.write(bytes(buf))


def encode_write_batch(seq, entries):
    """entries: list of (key, value) with value=None meaning deletion."""
    out = bytearray(struct.pack("<QI", seq, len(entries)))
    for key, value in entries:
        if value is None:
            out += b"\x00" + _prefixed(key)
        else:
            out += b"\x01" + _prefixed(key) + _prefixed(value)
    return bytes(out)


def _build_block(entries, restart_interval=4):
    """Restart-point prefix-compressed block (no compression applied here)."""
    out = bytearray()
    restarts = []
    prev = b""
    for i, (key, value) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            while (
                shared < len(prev)
                and shared < len(key)
                and prev[shared] == key[shared]
            ):
                shared += 1
        out += _varint(shared) + _varint(len(key) - shared) + _varint(len(value))
        out += key[shared:] + value
        prev = key
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def snappy_compress_literal(data):
    """Valid Snappy: the whole payload as literal elements (≤60-byte runs
    use the short tag, longer runs the 1-byte-length tag)."""
    out = bytearray(_varint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 256]
        pos += len(chunk)
        if len(chunk) <= 60:
            out.append((len(chunk) - 1) << 2)
        else:
            out.append(60 << 2 | 0)  # 1 extra length byte
            out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def write_table_file(path, entries, *, seq_base=1, compress=False, block_size=512):
    """Block-based table: data blocks, index block of BlockHandles, footer."""
    internal = [
        (key + struct.pack("<Q", (seq_base + i) << 8 | 1), value)
        for i, (key, value) in enumerate(entries)
    ]
    buf = bytearray()
    handles = []  # (last_key_in_block, offset, size)
    i = 0
    while i < len(internal):
        block_entries = []
        approx = 0
        while i < len(internal) and (approx < block_size or not block_entries):
            block_entries.append(internal[i])
            approx += len(internal[i][0]) + len(internal[i][1]) + 8
            i += 1
        raw = _build_block(block_entries)
        ctype = 1 if compress else 0
        content = snappy_compress_literal(raw) if compress else raw
        handles.append((block_entries[-1][0], len(buf), len(content)))
        crc = _mask_crc(_crc32c(content + bytes((ctype,))))
        buf += content + bytes((ctype,)) + struct.pack("<I", crc)

    def handle(off, size):
        return _varint(off) + _varint(size)

    meta_block = _build_block([])
    meta_off = len(buf)
    crc = _mask_crc(_crc32c(meta_block + b"\x00"))
    buf += meta_block + b"\x00" + struct.pack("<I", crc)
    index_entries = [(last, handle(off, size)) for last, off, size in handles]
    index_block = _build_block(index_entries, restart_interval=1)
    index_off = len(buf)
    crc = _mask_crc(_crc32c(index_block + b"\x00"))
    buf += index_block + b"\x00" + struct.pack("<I", crc)
    footer = handle(meta_off, len(meta_block)) + handle(index_off, len(index_block))
    footer += b"\x00" * (40 - len(footer)) + struct.pack("<Q", TABLE_MAGIC)
    buf += footer
    with open(path, "wb") as f:
        f.write(bytes(buf))


def write_manifest(dbdir, edits, manifest_no=1):
    name = f"MANIFEST-{manifest_no:06d}"
    write_log_file(os.path.join(dbdir, name), edits)
    with open(os.path.join(dbdir, "CURRENT"), "wb") as f:
        f.write(name.encode() + b"\n")


def version_edit(comparator=None, log_number=None, new_files=(), deleted_files=()):
    out = bytearray()
    if comparator is not None:
        out += _varint(1) + _prefixed(comparator)
    if log_number is not None:
        out += _varint(2) + _varint(log_number)
    for level, number, size, smallest, largest in new_files:
        out += _varint(7) + _varint(level) + _varint(number) + _varint(size)
        out += _prefixed(smallest) + _prefixed(largest)
    for level, number in deleted_files:
        out += _varint(6) + _varint(level) + _varint(number)
    return bytes(out)


def _ikey(user_key, seq=1):
    return user_key + struct.pack("<Q", seq << 8 | 1)


def write_leveldb(dbdir, items, *, via="log", compress=False):
    """Write {key: value} as a real LevelDB directory.

    via="log": everything in the un-compacted WAL memtable (what a Caffe
    packer that wrote <4 MB and closed leaves behind). via="table": one L0
    .ldb file (the compacted shape), empty trailing WAL.
    """
    os.makedirs(dbdir, exist_ok=True)
    items = sorted(items)
    if via == "log":
        write_manifest(
            dbdir,
            [version_edit(comparator=b"leveldb.BytewiseComparator", log_number=2)],
        )
        batches = [
            encode_write_batch(1 + i, [kv]) for i, kv in enumerate(items)
        ]
        write_log_file(os.path.join(dbdir, "000002.log"), batches)
    else:
        write_table_file(
            os.path.join(dbdir, "000004.ldb"),
            items,
            compress=compress,
        )
        size = os.path.getsize(os.path.join(dbdir, "000004.ldb"))
        write_manifest(
            dbdir,
            [
                version_edit(
                    comparator=b"leveldb.BytewiseComparator",
                    log_number=5,
                    new_files=[
                        (0, 4, size, _ikey(items[0][0]), _ikey(items[-1][0]))
                    ],
                )
            ],
        )
        write_log_file(os.path.join(dbdir, "000005.log"), [])


# -- snappy ------------------------------------------------------------------


def test_snappy_literal_round_trip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    assert snappy_decompress(snappy_compress_literal(data)) == data


def test_snappy_copy_tags():
    # "abcd" literal + copy1(offset=4,len=4) -> "abcdabcd"
    stream = _varint(8) + bytes([(4 - 1) << 2]) + b"abcd" + bytes([(0 << 2) | 1, 4])
    assert snappy_decompress(stream) == b"abcdabcd"
    # overlapping copy: "ab" then copy(offset=2,len=6) -> "abababab"
    stream = _varint(8) + bytes([(2 - 1) << 2]) + b"ab"
    stream += bytes([((6 - 4) << 2) | 1, 2])
    assert snappy_decompress(stream) == b"abababab"
    # copy2: offset as 2-byte LE
    stream = _varint(6) + bytes([(3 - 1) << 2]) + b"xyz"
    stream += bytes([((3 - 1) << 2) | 2]) + struct.pack("<H", 3)
    assert snappy_decompress(stream) == b"xyzxyz"


def test_snappy_length_mismatch_raises():
    with pytest.raises(LevelDBError):
        snappy_decompress(_varint(5) + bytes([(3 - 1) << 2]) + b"abc")


# -- reader ------------------------------------------------------------------


def _items(n, vsize=100, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (b"%07d" % i, rng.integers(0, 256, vsize, dtype=np.uint8).tobytes())
        for i in range(n)
    ]


@pytest.mark.parametrize("via", ["log", "table"])
def test_reader_round_trip(tmp_path, via):
    items = _items(20, vsize=300)
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, items, via=via)
    db = LevelDBReader(dbdir)
    assert len(db) == 20
    assert list(db.items()) == items
    assert db.key(3) == b"0000003"
    assert db.value(3) == items[3][1]


def test_reader_snappy_table(tmp_path):
    items = _items(10, vsize=2000, seed=3)
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, items, via="table", compress=True)
    assert list(LevelDBReader(dbdir).items()) == items


def test_reader_large_record_spans_log_blocks(tmp_path):
    # one WriteBatch > 32 KiB forces FIRST/MIDDLE/LAST reassembly
    items = [(b"big", os.urandom(3 * LOG_BLOCK_SIZE)), (b"sml", b"x")]
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, items, via="log")
    db = LevelDBReader(dbdir)
    assert db.value(0) == items[0][1]
    assert db.value(1) == b"x"


def test_newest_sequence_wins_and_deletions_drop(tmp_path):
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    write_manifest(
        dbdir, [version_edit(comparator=b"leveldb.BytewiseComparator", log_number=2)]
    )
    batches = [
        encode_write_batch(1, [(b"a", b"old"), (b"b", b"keep")]),
        encode_write_batch(3, [(b"a", b"new"), (b"c", b"dead")]),
        encode_write_batch(5, [(b"c", None)]),  # deletion
    ]
    write_log_file(os.path.join(dbdir, "000002.log"), batches)
    db = LevelDBReader(dbdir)
    assert list(db.items()) == [(b"a", b"new"), (b"b", b"keep")]


def test_manifest_deleted_files_respected(tmp_path):
    # table 4 is superseded (compaction wrote table 6, deleted 4); a reader
    # that ignored VersionEdit deletions would resurrect the old value.
    dbdir = str(tmp_path / "db")
    os.makedirs(dbdir)
    write_table_file(os.path.join(dbdir, "000004.ldb"), [(b"k", b"stale")], seq_base=1)
    write_table_file(os.path.join(dbdir, "000006.ldb"), [(b"k", b"fresh")], seq_base=9)
    edits = [
        version_edit(
            comparator=b"leveldb.BytewiseComparator",
            log_number=5,
            new_files=[(0, 4, 1, _ikey(b"k"), _ikey(b"k"))],
        ),
        version_edit(
            log_number=7,
            new_files=[(1, 6, 1, _ikey(b"k", 9), _ikey(b"k", 9))],
            deleted_files=[(0, 4)],
        ),
    ]
    write_manifest(dbdir, edits)
    db = LevelDBReader(dbdir)
    assert list(db.items()) == [(b"k", b"fresh")]
    # sanity: the stale table alone would have answered "stale"
    os.remove(os.path.join(dbdir, "000006.ldb"))


def test_crc_corruption_detected(tmp_path):
    items = _items(4)
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, items, via="table")
    path = os.path.join(dbdir, "000004.ldb")
    buf = bytearray(open(path, "rb").read())
    buf[10] ^= 0xFF
    open(path, "wb").write(bytes(buf))
    with pytest.raises(LevelDBError):
        list(LevelDBReader(dbdir).items())
    assert list(LevelDBReader(dbdir, verify_crc=False).items())  # opt-out


def test_not_a_leveldb(tmp_path):
    with pytest.raises(LevelDBError):
        LevelDBReader(str(tmp_path))


# -- the flow dataset + open_dataset wiring ----------------------------------


@pytest.mark.parametrize("via", ["log", "table"])
def test_flow_dataset_end_to_end(tmp_path, via):
    rng = np.random.default_rng(7)
    items, truth = [], []
    for i in range(6):
        datum, img0, img1, flow, occ = make_flow_datum(rng, 6, 8, label=i % 2)
        items.append((b"%07d" % i, datum))
        truth.append((img0, img1, flow, occ))
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, items, via=via, compress=(via == "table"))
    ds = LevelDBFlowDataset(dbdir)
    assert len(ds) == 6
    for i, (img0, img1, flow, occ) in enumerate(truth):
        item = ds[i]
        # LmdbFlowDataset contract: BGR->RGB flip + CHW->HWC
        np.testing.assert_array_equal(
            item["img0"], np.moveaxis(img0, 0, -1)[..., ::-1].astype(np.float32)
        )
        np.testing.assert_allclose(item["flow"][1:], flow[1:], atol=1 / 32.0)
        assert item["label"] == i % 2
    # the inherited CustomData permutation machinery works unchanged
    perm = ds.permutation(preselection_label=1)
    assert perm.tolist() == [1, 3, 5]


def test_open_dataset_sniffs_leveldb(tmp_path):
    rng = np.random.default_rng(1)
    datum, *_ = make_flow_datum(rng, 6, 8)
    dbdir = str(tmp_path / "db")
    write_leveldb(dbdir, [(b"0000000", datum)], via="log")
    from flownet2_tpu.data.datasets import open_dataset

    ds = open_dataset("auto", dbdir)
    assert isinstance(ds, LevelDBFlowDataset) and len(ds) == 1
    assert isinstance(open_dataset("leveldb", dbdir), LevelDBFlowDataset)
