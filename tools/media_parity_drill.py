#!/usr/bin/env python3
"""Oracle-side refusal-parity drill for the media queries.

The engine parsers' refusals on malformed containers are pinned in
MultimodalSpec (Scala). This drill pins the DUCKDB ORACLES to the same
behavior: it takes the canonical blobs the engine exported for the gate,
applies the same corruptions the Scala spec applies (lying chunk/box
sizes, truncation, size-0 boxes, non-FF marker walks, top-down BMP),
runs the committed oracle SQL (from Verify's oracle_sql.json dump, with
the export path rewritten to the corrupted copy), and asserts each
corrupted doc lands on the SENTINEL row — matching the engine's
whole-document None — while untouched docs still parse.

Run after `Verify ... q_multimodal_dims q_audio_meta q_video_meta
q_image_pixels q_video_frames q_exif_meta q_audio_features`:
    python3 tools/media_parity_drill.py /tmp/out

r14: the EXCLUSION-rule queries (image pixels / video frames / exif /
audio features) are drilled too — a corrupted doc must VANISH from the
oracle output (their engine refusals are pinned in MultimodalSpec), and
untouched docs must stay byte-identical.
"""
import io
import json
import struct
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def load(glob_path):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT * FROM '{glob_path}' ORDER BY doc_id").fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    return cols, [list(r) for r in rows]


def rewrite(sql, old_glob, new_glob):
    assert old_glob in sql, f"export path {old_glob} not in oracle SQL"
    return sql.replace(old_glob, new_glob)


def run_oracle(sql, outdir):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    cols = [d[0] for d in con.description]
    con.close()
    return cols, {r[0]: r for r in rows}


def export_glob(sql):
    # the FROM '<path>/*.parquet' literal inside the exported oracle SQL
    import re
    m = re.search(r"FROM '([^']+\*\.parquet)'", sql)
    assert m, "no export glob in oracle SQL"
    return m.group(1)


def write_blobs(path, cols, rows):
    doc_ids = [r[0] for r in rows]
    arrays = {"doc_id": pa.array(doc_ids, pa.int64())}
    for i, c in enumerate(cols):
        if c == "doc_id":
            continue
        vals = [r[i] for r in rows]
        if c == "payload":
            arrays[c] = pa.array([bytes(v) for v in vals], pa.binary())
        else:
            arrays[c] = pa.array(vals)
    pq.write_table(pa.table(arrays), path)


def main(outdir):
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = []

    def check(name, doc_id, row, expect, what):
        got = tuple(row)
        if got != tuple(expect):
            failures.append(f"{name} doc {doc_id} ({what}):\n"
                            f"  got      {got}\n  expected {tuple(expect)}")

    # ---- audio: truncated/lying data-chunk size must refuse the doc ----
    sql = oracles["q_audio_meta"]
    glob_a = export_glob(sql)
    cols, rows = load(glob_a)
    pi = cols.index("payload")
    victims = {}
    r0 = rows[0]  # lying data size (the spec's WavHeader corruption)
    b = bytearray(r0[pi]); b[43] = 0x7F; r0[pi] = bytes(b)
    victims[r0[0]] = "lying data-chunk size"
    r1 = rows[1]  # truncated mid-data: last chunk overruns
    r1[pi] = bytes(r1[pi][:-7])
    victims[r1[0]] = "truncated data chunk"
    r2 = rows[2]  # huge first-chunk size (~2^31): unsigned-read path
    b = bytearray(r2[pi])
    b[16:20] = struct.pack("<I", 0x7FFFFFF8)
    r2[pi] = bytes(b)
    victims[r2[0]] = "huge fmt-chunk size"
    tmp = "/tmp/graft-drill-audio.parquet"
    write_blobs(tmp, cols, rows)
    _, res = run_oracle(rewrite(sql, glob_a, tmp), outdir)
    for r in rows[:8]:
        doc = r[0]
        n = len(r[pi])
        got = res[doc]
        if doc in victims:
            check("q_audio_meta", doc, got,
                  (doc, -1, -1, -1, -1, -1, 0, n), victims[doc])
        elif doc % 11 in (5, 7):
            # r14 fixture variants: float (tag 3) / ADPCM (tag 2) WAVs are
            # REFUSED by design — the sentinel here is the expected row
            check("q_audio_meta", doc, got,
                  (doc, -1, -1, -1, -1, -1, 0, n), "non-PCM by design")
        elif got[1] == -1:
            failures.append(f"q_audio_meta doc {doc}: untouched blob "
                            f"unexpectedly hit the sentinel: {got}")

    # ---- video: lying moov size, size-0 box (anti-hang), big mdat ----
    sql = oracles["q_video_meta"]
    glob_v = export_glob(sql)
    cols, rows = load(glob_v)
    pi = cols.index("payload")
    victims = {}
    r0 = rows[0]  # lying moov size (spec corruption)
    b = bytearray(r0[pi]); b[24] = 0x7F; r0[pi] = bytes(b)
    victims[r0[0]] = "lying moov size"
    r1 = rows[1]  # size-0 top-level box appended: must refuse, NOT hang
    r1[pi] = bytes(r1[pi]) + struct.pack(">I", 0) + b"free" + b"\x00" * 8
    victims[r1[0]] = "size-0 box"
    r2 = rows[2]  # mdat size overruns the buffer
    r2[pi] = bytes(r2[pi][:-5])
    victims[r2[0]] = "truncated mdat"
    r3 = rows[3]  # moov child (mvhd) size overruns the moov extent
    b = bytearray(r3[pi]); b[32:36] = struct.pack(">I", 0x7000)
    r3[pi] = bytes(b)
    victims[r3[0]] = "lying mvhd size"
    tmp = "/tmp/graft-drill-video.parquet"
    write_blobs(tmp, cols, rows)
    _, res = run_oracle(rewrite(sql, glob_v, tmp), outdir)
    for r in rows[:8]:
        doc = r[0]
        n = len(r[pi])
        got = res[doc]
        if doc in victims:
            check("q_video_meta", doc, got,
                  (doc, "?", -1, -1, -1, -1, 0, n), victims[doc])
        elif got[1] == "?":
            failures.append(f"q_video_meta doc {doc}: untouched blob "
                            f"unexpectedly hit the sentinel: {got}")

    # ---- images: non-FF SOF walk, top-down BMP, truncated headers ----
    sql = oracles["q_multimodal_dims"]
    glob_m = export_glob(sql)
    cols, rows = load(glob_m)
    pi = cols.index("payload")
    fi = cols.index("fmt")
    # crafted JPEG: APP1 segment whose length lands the walk on a non-FF
    # byte that is followed by an SOF code (0xC0): engine -> None; the
    # oracle's jpg CTE must ALSO refuse (the ADVICE finding)
    jpg_bad = bytes([0xFF, 0xD8,
                     0xFF, 0xE1, 0x00, 0x04, 0x00, 0x00,  # APP1 len 4
                     0x00, 0xC0,  # walk lands HERE: non-FF then SOF code
                     0x00, 0x08, 0x00, 0x10, 0x00, 0x20, 0x03, 0x00])
    # crafted top-down BMP: biHeight = -16 (0xFFFFFFF0 LE): engine parses
    # (height -16); the oracle must produce the SIGNED value, not abort
    bmp_td = bytearray(54)
    bmp_td[0:2] = b"BM"
    bmp_td[18:22] = struct.pack("<i", 32)
    bmp_td[22:26] = struct.pack("<i", -16)
    bmp_td[28:30] = struct.pack("<H", 24)
    victims = {}
    r0 = rows[0]
    r0[pi] = jpg_bad; r0[fi] = "jpg"
    victims[r0[0]] = ("non-FF SOF walk", (r0[0], "jpg", "unknown",
                                          -1, -1, -1, len(jpg_bad)))
    r1 = rows[1]
    r1[pi] = bytes(bmp_td); r1[fi] = "bmp"
    victims[r1[0]] = ("top-down BMP", (r1[0], "bmp", "bmp",
                                       32, -16, 24, len(bmp_td)))
    r2 = rows[2]  # truncated PNG header (below the 26-byte minimum)
    r2[pi] = bytes(r2[pi][:20]) if r2[fi] == "png" else bytes(
        [0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A] + [0] * 10)
    victims[r2[0]] = ("truncated PNG", (r2[0], r2[fi], "unknown",
                                        -1, -1, -1, len(r2[pi])))
    tmp = "/tmp/graft-drill-media.parquet"
    write_blobs(tmp, cols, rows)
    _, res = run_oracle(rewrite(sql, glob_m, tmp), outdir)
    for r in rows[:8]:
        doc = r[0]
        got = res[doc]
        if doc in victims:
            what, expect = victims[doc]
            check("q_multimodal_dims", doc, got, expect, what)
        elif got[2] == "unknown":
            failures.append(f"q_multimodal_dims doc {doc}: untouched blob "
                            f"unexpectedly hit the sentinel: {got}")

    # ---- r14 EXCLUSION-rule queries: a corrupted doc must vanish from
    # the oracle output (the engine's refusal for the same corruption is
    # pinned in MultimodalSpec — together that's whole-row parity), and
    # untouched docs must be byte-identical to the pristine run ----
    def drill_absent(qname, corruptions, tmpname, eligible=None):
        sql = oracles[qname]
        g = export_glob(sql)
        cols, rows = load(g)
        pi = cols.index("payload")
        con = duckdb.connect()
        base_rows = con.execute(sql).fetchall()
        con.close()
        base_ids = {r[0] for r in base_rows}
        victims = {}
        pool = [r for r in rows if r[0] in base_ids
                and (eligible is None or eligible(bytes(r[pi])))]
        assert len(pool) >= len(corruptions), f"{qname}: no victims"
        for (what, fn), r in zip(corruptions, pool):
            r[pi] = fn(bytes(r[pi]))
            victims[r[0]] = what
        tmp = f"/tmp/graft-drill-{tmpname}.parquet"
        write_blobs(tmp, cols, rows)
        con = duckdb.connect()
        new_rows = con.execute(rewrite(sql, g, tmp)).fetchall()
        con.close()
        new_ids = {r[0] for r in new_rows}
        for doc, what in victims.items():
            if doc in new_ids:
                failures.append(f"{qname} doc {doc} ({what}): corrupted "
                                f"blob still emitted by the oracle")
        ub = {tuple(r) for r in base_rows if r[0] not in victims}
        un = {tuple(r) for r in new_rows if r[0] not in victims}
        if ub != un:
            failures.append(f"{qname}: untouched rows changed under drill")

    def le32(b, i):
        return struct.unpack_from("<I", b, i)[0]

    def patch(b, i, vals):
        b = bytearray(b)
        for k, v in enumerate(vals):
            b[i + k] = v
        return bytes(b)

    # q_image_pixels: top-down height, 32-bit pixels, truncated array
    def flip_height(b):
        h = struct.unpack_from("<i", b, 22)[0]
        return patch(b, 22, struct.pack("<i", -h))
    drill_absent("q_image_pixels", [
        ("top-down height", flip_height),
        ("32-bit pixels", lambda b: patch(b, 28, [32])),
        ("truncated pixel array", lambda b: b[:-1]),
    ], "imagepx")

    # q_video_frames: count/box-length mismatch, zero-size sample,
    # truncated mdat (tiling + walk refusal)
    def stsz_at(b):
        return b.index(b"stsz") - 4
    drill_absent("q_video_frames", [
        ("lying stsz count", lambda b: patch(b, stsz_at(b) + 19,
                                             [b[stsz_at(b) + 19] + 1])),
        ("zero-size sample", lambda b: patch(b, stsz_at(b) + 20,
                                             [0, 0, 0, 0])),
        ("truncated mdat", lambda b: b[:-3]),
    ], "videofr")

    # q_exif_meta: byte-order garbage, bad TIFF magic, orientation 0
    drill_absent("q_exif_meta", [
        ("byte-order garbage", lambda b: patch(b, 12, b"XX")),
        ("bad TIFF magic", lambda b: patch(b, 14, [43, 43])),
        ("orientation 0", lambda b: patch(b, 54, [0, 0])),
    ], "exif")

    # q_audio_features: overrunning data-chunk size, non-PCM format tag
    def data_at(b):
        return b.index(b"data")
    drill_absent("q_audio_features", [
        ("lying data-chunk size", lambda b: patch(b, data_at(b) + 7,
                                                  [0x7F])),
        ("non-PCM tag", lambda b: patch(b, 20, [2, 0])),
    ], "audiofeat")

    # ---- r18 PAIR queries (perceptual fingerprints): a corrupted doc
    # must vanish from BOTH pair columns (it refuses fingerprinting, so
    # it can't be a candidate), and pairs between untouched docs must be
    # byte-identical. Victims are drawn from docs that PARTICIPATE in at
    # least one baseline pair, so the drill proves disappearance rather
    # than vacuous absence. ----
    def drill_pairs(qname, corruptions, tmpname):
        sql = oracles[qname]
        g = export_glob(sql)
        cols, rows = load(g)
        pi = cols.index("payload")
        con = duckdb.connect()
        base_rows = con.execute(sql).fetchall()
        con.close()
        participants = ({r[0] for r in base_rows}
                        | {r[1] for r in base_rows})
        assert participants, f"{qname}: no baseline pairs to drill"
        victims = {}
        pool = [r for r in rows if r[0] in participants]
        assert len(pool) >= len(corruptions), f"{qname}: no victims"
        for (what, fn), r in zip(corruptions, pool):
            r[pi] = fn(bytes(r[pi]))
            victims[r[0]] = what
        tmp = f"/tmp/graft-drill-{tmpname}.parquet"
        write_blobs(tmp, cols, rows)
        con = duckdb.connect()
        new_rows = con.execute(rewrite(sql, g, tmp)).fetchall()
        con.close()
        for doc, what in victims.items():
            for r in new_rows:
                if r[0] == doc or r[1] == doc:
                    failures.append(f"{qname} doc {doc} ({what}): "
                                    f"corrupted blob still pairs: {r}")
        ub = {tuple(r) for r in base_rows
              if r[0] not in victims and r[1] not in victims}
        un = {tuple(r) for r in new_rows
              if r[0] not in victims and r[1] not in victims}
        if ub != un:
            failures.append(f"{qname}: untouched pairs changed under drill")

    drill_pairs("q_image_phash", [
        ("truncated pixel array", lambda b: b[:-1]),
        ("32-bit pixels", lambda b: patch(b, 28, [32])),
    ], "phash")
    drill_pairs("q_audio_fingerprint", [
        ("lying data-chunk size", lambda b: patch(b, data_at(b) + 7,
                                                  [0x7F])),
        ("non-PCM tag", lambda b: patch(b, 20, [2, 0])),
    ], "audiofp")
    drill_pairs("q_video_fingerprint", [
        ("lying stsz count", lambda b: patch(b, stsz_at(b) + 19,
                                             [b[stsz_at(b) + 19] + 1])),
        ("truncated mdat", lambda b: b[:-3]),
    ], "videofp")

    if failures:
        print("MEDIA PARITY DRILL FAILED:")
        for f in failures:
            print(f)
        sys.exit(1)
    print("media parity drill: sentinel rows + exclusion rules verified on "
          "every corruption, untouched blobs unchanged — OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/out")
