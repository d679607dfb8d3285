"""Round-12 additions: SI epidemic spread, 1-WL color refinement,
UniMax mixture allocation. Each pinned by a planted fixture or a
pure-Python differential (the coins/colors use the portable md5 hash,
so Python can replay every draw exactly)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from neo4j_dynagraph_spark.operators import graph, text


def _h64(s: str) -> int:
    """Pure-Python twin of functions.hash64 (first 15 md5 hex chars)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- SI


def _py_si(contacts, seed_mod, p10, max_hops):
    """Reference SI: BFS over time-respecting coin-passing contacts.
    contacts: list of (frame, a, b) undirected."""
    nodes = {a for _, a, _ in contacts} | {b for _, _, b in contacts}
    inf = {v: -1 for v in nodes if _h64(f"si:{v}") % seed_mod == 0}
    directed = [(f, a, b) for f, a, b in contacts] + [
        (f, b, a) for f, a, b in contacts
    ]
    passing = [
        (f, u, v)
        for f, u, v in directed
        if _h64(f"sc:{f}:{u}:{v}") % 10 < p10
    ]
    for _ in range(max_hops):
        new = {}
        for f, u, v in passing:
            if u in inf and f >= inf[u]:
                t = min(new.get(v, f), f)
                if v not in inf or t < inf[v]:
                    new[v] = t
        changed = False
        for v, t in new.items():
            if v not in inf or t < inf[v]:
                inf[v] = t
                changed = True
        if not changed:
            break
    return inf


CONTACTS = [
    # a little temporal graph: chain 1-2-3-4 with time-increasing
    # frames, a shortcut, and a late isolated pair
    (100, 1, 2),
    (101, 2, 3),
    (102, 3, 4),
    (100, 1, 5),
    (105, 5, 6),
    (99, 7, 8),
    (103, 4, 7),
    (104, 6, 2),
]


def _si_df(spark):
    return spark.createDataFrame(
        CONTACTS, "frame_id long, actor1 long, actor2 long"
    )


def test_si_spread_differential(spark):
    """Spark SI curve == pure-Python replay of the same hash coins,
    across several (seed_mod, beta) operating points."""
    for seed_mod, p10 in ((1, 10), (2, 10), (2, 5), (3, 3), (1, 0)):
        inf = _py_si(CONTACTS, seed_mod, p10, max_hops=6)
        want = {}
        for v, t in inf.items():
            b = -1 if t < 0 else t // 4
            want[b] = want.get(b, 0) + 1
        got = {
            r.bucket: r.n_infected
            for r in graph.si_spread(
                _si_df(spark),
                seed_mod=seed_mod,
                p10=p10,
                max_hops=6,
                bucket_frames=4,
            ).collect()
        }
        assert got == want, (seed_mod, p10, got, want)


def test_si_spread_beta1_is_temporal_reach(spark):
    """beta = 1 (p10=10): the infected set must equal time-respecting
    reachability from the seed set, and the cumulative column must be
    a running sum."""
    rows = graph.si_spread(
        _si_df(spark), seed_mod=2, p10=10, max_hops=6, bucket_frames=4
    ).collect()
    cum = 0
    for r in rows:
        cum += r.n_infected
        assert r.cum_infected == cum
    inf = _py_si(CONTACTS, 2, 10, 6)
    assert cum == len(inf)
    # monotone in beta: lower transmissibility infects a subset
    low = _py_si(CONTACTS, 2, 3, 6)
    assert set(low) <= set(inf)


# ---------------------------------------------------------------- WL


def test_wl_c6_vs_two_triangles_indistinguishable(spark):
    """The classic 1-WL counterexample: C6 and 2xC3 are both
    2-regular, so every node keeps the same color forever — one color
    class of size 12 (the invariance that makes WL a sound, not
    complete, isomorphism test)."""
    c6 = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 6)]
    tri2 = [(11, 12), (12, 13), (11, 13), (14, 15), (15, 16), (14, 16)]
    e = spark.createDataFrame(c6 + tri2, "actor1 long, actor2 long")
    rows = graph.wl_refinement(e, rounds=3).collect()
    assert len(rows) == 12
    assert len({r.wl_color for r in rows}) == 1
    assert all(r.class_size == 12 for r in rows)


def test_wl_path_splits_by_role(spark):
    """P4 (a-b-c-d): ends {a,d} and middles {b,c} are the two orbits;
    WL must find exactly those classes and be deterministic."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "actor1 long, actor2 long"
    )
    rows = {r.actor: (r.wl_color, r.class_size) for r in
            graph.wl_refinement(e, rounds=3).collect()}
    assert rows[1] == rows[4] and rows[2] == rows[3]
    assert rows[1][0] != rows[2][0]
    assert rows[1][1] == 2 and rows[2][1] == 2
    again = {r.actor: (r.wl_color, r.class_size) for r in
             graph.wl_refinement(e, rounds=3).collect()}
    assert rows == again


def test_wl_star_refines_past_degree(spark):
    """Star + pendant chain: node 5 and the leaves share degree 1 at
    round 0 only if symmetric — here leaf-of-hub vs leaf-of-path
    split once neighbor colors flow (round >= 2). Fixture: hub 1 with
    leaves 2,3,4 and a path 4-5."""
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (4, 5)], "actor1 long, actor2 long"
    )
    rows = {r.actor: r.wl_color for r in
            graph.wl_refinement(e, rounds=3).collect()}
    # leaves of the hub (2,3) identical; 5 (leaf of a degree-2 node)
    # must differ from them even though all three have degree 1
    assert rows[2] == rows[3]
    assert rows[5] != rows[2]
    assert len({rows[1], rows[4]}) == 2  # hub vs bridge distinct


# ------------------------------------------------------------ UniMax


def _docs_df(spark, sizes):
    """One doc per source with an exact whitespace-token count."""
    rows = [
        (i, f"s{i}", " ".join(f"w{j}" for j in range(n)))
        for i, n in enumerate(sizes)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_unimax_waterfill_mixed(spark):
    """Sizes 10/10/100, cap 1, budget 95% of 120 = 114: both small
    sources capped in full, the big one takes the 94-token remainder
    (hand-computed waterfill)."""
    out = {
        r.source: r
        for r in text.unimax_mix(
            _docs_df(spark, [10, 10, 100]),
            epoch_cap=1, budget_num=95, budget_den=100,
        ).collect()
    }
    assert out["s0"].capped and out["s1"].capped and not out["s2"].capped
    assert out["s0"].alloc_tokens == 10.0
    assert out["s1"].alloc_tokens == 10.0
    assert out["s2"].alloc_tokens == 94.0
    assert out["s2"].epochs == 0.94
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5


def test_unimax_all_capped_leaves_budget_unspent(spark):
    """Budget 3x the corpus with cap 1: every source capped at one
    epoch, total allocation < budget (UniMax semantics, not an
    error)."""
    out = text.unimax_mix(
        _docs_df(spark, [5, 7]), epoch_cap=1, budget_num=300,
        budget_den=100,
    ).collect()
    assert all(r.capped for r in out)
    assert sum(r.alloc_tokens for r in out) == 12.0
    assert all(r.epochs == 1.0 for r in out)


def test_unimax_uniform_when_budget_tight(spark):
    """Budget below k*min(cap*n): nobody capped, everyone gets B/k.
    Sizes 50/60, cap 1, budget 50% of 110 = 55 -> 27.5 each."""
    out = text.unimax_mix(
        _docs_df(spark, [50, 60]), epoch_cap=1, budget_num=50,
        budget_den=100,
    ).collect()
    assert all(not r.capped for r in out)
    assert all(r.alloc_tokens == 27.5 for r in out)


def test_si_attack_rates_differential(spark):
    """Every beta lane of the sweep == an independent pure-Python SI
    replay at that beta; attack rate monotone non-decreasing in
    beta; the p10=3 lane's infected count == si_spread's."""
    grid = (1, 3, 5, 10)
    rows = {
        r.p10: r
        for r in graph.si_attack_rates(
            _si_df(spark), seed_mod=2, p10_grid=grid, max_hops=6
        ).collect()
    }
    assert set(rows) == set(grid)
    prev = -1.0
    for p10 in grid:
        inf = _py_si(CONTACTS, 2, p10, 6)
        n_seeds = sum(1 for t in inf.values() if t < 0)
        n_inf = sum(1 for t in inf.values() if t >= 0)
        assert rows[p10].n_seeds == n_seeds
        assert rows[p10].n_infected == n_inf
        assert rows[p10].attack_rate >= prev
        prev = rows[p10].attack_rate
    spread = graph.si_spread(
        _si_df(spark), seed_mod=2, p10=3, max_hops=6, bucket_frames=4
    ).collect()
    assert sum(r.n_infected for r in spread if r.bucket >= 0) == (
        rows[3].n_infected
    )


def test_stream_unimax_multibatch_boundary_shifts(spark, tmp_path):
    """The UniMax allocation drained one micro-batch at a time must
    equal the batch operator exactly — planted hazard: the last batch
    floods one source with tokens, moving the capped-prefix boundary
    computed from batches 0-1 (sources capped early must become
    uncapped-relative or stay, and every allocation rebinds)."""
    import glob
    import os
    import shutil

    from neo4j_dynagraph_spark.streaming.unimax import stream_unimax_mix

    def doc(i, src, n):
        return (i, src, " ".join(f"w{j}" for j in range(n)))

    shards = [
        [doc(1, "a", 10), doc(2, "b", 12)],
        [doc(3, "c", 30), doc(4, "a", 5)],
        # the flood: source c gains 200 tokens last
        [doc(5, "c", 200)],
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for i, rows in enumerate(shards):
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).coalesce(1).write.parquet(str(src / f"shard_{i}"))
    for i in range(len(shards)):
        part = glob.glob(str(src / f"shard_{i}" / "*.parquet"))[0]
        shutil.move(part, str(src / f"s{i}.parquet"))
        shutil.rmtree(str(src / f"shard_{i}"))
        os.utime(str(src / f"s{i}.parquet"), (1000 + i, 1000 + i))

    schema = spark.read.parquet(str(src)).schema
    streamed = sorted(
        map(
            tuple,
            stream_unimax_mix(
                spark, str(src), schema, epoch_cap=1, budget_num=95,
                budget_den=100, max_files_per_trigger=1,
            ).collect(),
        )
    )
    batch = sorted(
        map(
            tuple,
            text.unimax_mix(
                spark.read.parquet(str(src)), epoch_cap=1,
                budget_num=95, budget_den=100,
            ).collect(),
        )
    )
    assert streamed == batch and len(streamed) == 3
    by_source = {r[0]: r for r in streamed}
    # totals: a=15, b=12, c=230 -> B = 244 (95% of 257); ascending
    # b(12): 12*3=36 <= 244 capped; a(15): 15*2=30 <= 232 capped;
    # c(230): 230 > 244-27=217 -> uncapped, takes 217
    assert by_source["b"][3] and by_source["a"][3]
    assert not by_source["c"][3]
    assert by_source["c"][4] == 217.0


# ---------------------------------------------------- degree-discount


def _py_degree_discount(pairs, k, p10):
    """Reference greedy (Chen et al. 2009), integer dd10 scores."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    chosen, out = set(), []
    for r in range(1, k + 1):
        best = None
        for v in sorted(adj):
            if v in chosen:
                continue
            d = len(adj[v])
            t = len(adj[v] & chosen)
            dd10 = 10 * d - 20 * t - (d - t) * t * p10
            if best is None or dd10 > best[0] or (
                dd10 == best[0] and v < best[1]
            ):
                best = (dd10, v, d)
        if best is None:
            break
        chosen.add(best[1])
        out.append((r, best[1], best[2], best[0]))
    return out


def test_influence_seeds_avoids_hub_neighborhood(spark):
    """The degree-discount signature move: after picking hub 1, its
    degree-4 NEIGHBOR (node 2) is discounted below the independent
    degree-4 hub (node 10), so round 2 jumps to the other community —
    plain greedy-by-degree would not."""
    pairs = (
        [(1, v) for v in (2, 3, 4, 5, 6)]
        + [(2, v) for v in (7, 8, 9)]
        + [(10, v) for v in (11, 12, 13, 14)]
    )
    e = spark.createDataFrame(pairs, "actor1 long, actor2 long")
    rows = graph.influence_seeds(e, k=4, p10=3).collect()
    assert (rows[0].round, rows[0].actor) == (1, 1)
    assert (rows[1].round, rows[1].actor) == (2, 10)
    got = [(r.round, r.actor, r.degree, r.dd10) for r in rows]
    assert got == _py_degree_discount(pairs, 4, 3)


def test_influence_seeds_k_exceeds_nodes(spark):
    """k larger than V: selection stops at V rows (both engines'
    LIMIT-of-empty semantics), every node selected exactly once."""
    pairs = [(1, 2), (2, 3)]
    e = spark.createDataFrame(pairs, "actor1 long, actor2 long")
    rows = graph.influence_seeds(e, k=8, p10=3).collect()
    assert len(rows) == 3
    assert {r.actor for r in rows} == {1, 2, 3}
    assert [r.round for r in rows] == [1, 2, 3]


def _py_offspring(contacts, seed_mod, p10, max_hops):
    """Reference attribution: parent = min-id strictly-earlier
    infected coin-passing contact at the victim's infection frame."""
    inf = _py_si(contacts, seed_mod, p10, max_hops)
    directed = [(f, a, b) for f, a, b in contacts] + [
        (f, b, a) for f, a, b in contacts
    ]
    passing = {
        (f, u, v)
        for f, u, v in directed
        if _h64(f"sc:{f}:{u}:{v}") % 10 < p10
    }
    noff = {v: 0 for v in inf}
    for v, t in inf.items():
        if t < 0:
            continue
        cands = [
            u
            for f, u, vv in passing
            if vv == v and f == t and u in inf and inf[u] < t
        ]
        if cands:
            noff[min(cands)] += 1
    hist = {}
    for k in noff.values():
        hist[k] = hist.get(k, 0) + 1
    return hist


def test_si_offspring_differential(spark):
    """Offspring histogram == pure-Python attribution replay; total
    attributed offspring <= non-seed infections (same-frame chains
    unattributed, never double-counted)."""
    for seed_mod, p10 in ((1, 10), (2, 10), (2, 5), (3, 3)):
        want = _py_offspring(CONTACTS, seed_mod, p10, 6)
        got = {
            r.n_offspring: r.n_actors
            for r in graph.si_offspring(
                _si_df(spark), seed_mod=seed_mod, p10=p10, max_hops=6
            ).collect()
        }
        assert got == want, (seed_mod, p10, got, want)
        inf = _py_si(CONTACTS, seed_mod, p10, 6)
        n_nonseed = sum(1 for t in inf.values() if t >= 0)
        attributed = sum(k * n for k, n in got.items())
        assert attributed <= n_nonseed


# ------------------------------------------------------- MP4 demux


def test_mp4_roundtrip_closed_form():
    from neo4j_dynagraph_spark.operators import multimodal as mm

    for mid in (0, 1, 7, 123, 976, 10_000):
        d = mm.decode_mp4(mm.mp4_fixture(mid))
        n = 1 + mid % 7
        assert d["timescale"] == 1000
        assert d["duration"] == 500 + mid % 977
        assert d["n_tracks"] == 1 and d["codec"] == "mp4v"
        assert (d["width"], d["height"]) == (64 + mid % 16, 48 + mid % 9)
        assert d["n_samples"] == n
        assert d["sample_bytes"] == sum(
            16 + (mid + i) % 32 for i in range(n)
        )


def test_mp4_truncation_fuzz():
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neo4j_dynagraph_spark.operators import multimodal as mm

    @settings(max_examples=120, deadline=None)
    @given(mid=st.integers(0, 10_000), frac=st.floats(0.0, 1.0))
    def check(mid, frac):
        full = mm.mp4_fixture(mid)
        cut = full[: int(len(full) * frac)]
        if cut == full:
            mm.decode_mp4(cut)
            return
        with pytest.raises(ValueError):
            mm.decode_mp4(cut)

    check()


def test_mp4_stsz_mdat_mismatch_rejected():
    """Corrupting one stsz sample size must be caught by the
    sum(stsz) == mdat cross-check — the proof the table parse is
    real, not a header skim."""
    import struct

    import pytest

    from neo4j_dynagraph_spark.operators import multimodal as mm

    full = bytearray(mm.mp4_fixture(42))
    i = bytes(full).index(b"stsz")
    # first entry of the size table: stsz fourcc + vf(4) + fixed(4)
    # + count(4) -> entry 0 at i+16
    (v,) = struct.unpack(">I", full[i + 16 : i + 20])
    struct.pack_into(">I", full, i + 16, v + 1)
    with pytest.raises(ValueError, match="stsz total"):
        mm.decode_mp4(bytes(full))


def test_mp4_undersized_inner_box_raises_valueerror():
    """A box-tree-CONSISTENT payload whose mvhd/stsz/stsd body is
    shorter than its fixed layout must raise ValueError (the
    documented contract), not escape as struct.error or return a
    silently-truncated codec string (r12 advice)."""
    import struct

    import pytest

    from neo4j_dynagraph_spark.operators import multimodal as mm

    def boxed(four: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + four + body

    ftyp = boxed(b"ftyp", b"isom\x00\x00\x02\x00isom")
    # mvhd declared size covers only 12 body bytes (needs >= 20)
    short_mvhd = boxed(b"mvhd", b"\x00" * 12)
    with pytest.raises(ValueError, match="mvhd"):
        mm.decode_mp4(ftyp + boxed(b"moov", short_mvhd))
    # stsz with cnt=4 but only one table entry present
    stsz_body = b"\x00" * 4 + struct.pack(">II", 0, 4) + b"\x00\x00\x00\x08"
    mvhd = boxed(b"mvhd", b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", 1000, 5000) + b"\x00" * 80)
    with pytest.raises(ValueError, match="stsz"):
        mm.decode_mp4(
            ftyp + boxed(b"moov", mvhd + boxed(b"stsz", stsz_body))
        )
    # stsd with a 4-byte body: too short to hold even its entry count
    with pytest.raises(ValueError, match="stsd"):
        mm.decode_mp4(
            ftyp
            + boxed(b"moov", mvhd + boxed(b"stsd", b"\x00" * 8))
        )
    # undersized tkhd (cannot hold the trailing width/height dwords)
    with pytest.raises(ValueError, match="tkhd"):
        mm.decode_mp4(
            ftyp + boxed(b"moov", mvhd + boxed(b"tkhd", b"\x00" * 6))
        )


def test_mp4_samples_reconstruct_mdat():
    """mp4_samples must slice the mdat into exactly the stsz-declared
    ranges: concatenating them reproduces the payload body, each
    sample matches its closed-form fixture bytes, and a corrupted
    table still raises (decode_mp4 runs first)."""
    import pytest

    from neo4j_dynagraph_spark.operators import multimodal as mm

    for mid in (0, 5, 42, 997):
        full = mm.mp4_fixture(mid)
        samples = mm.mp4_samples(full)
        nsamp = 1 + mid % 7
        assert len(samples) == nsamp
        for i, s in enumerate(samples):
            sz = 16 + (mid + i) % 32
            assert len(s) == sz
            assert s == bytes((mid + i + j) % 256 for j in range(sz))
        i = full.index(b"mdat") + 4
        assert b"".join(samples) == full[i:]
    with pytest.raises(ValueError):
        mm.mp4_samples(mm.mp4_fixture(7)[:40])


def test_mp4_largesize_box_supported():
    """A 64-bit largesize mdat (size field == 1 + uint64) must parse
    identically — the walker's big-file path."""
    import struct

    from neo4j_dynagraph_spark.operators import multimodal as mm

    full = mm.mp4_fixture(9)
    i = full.index(b"mdat") - 4
    (size,) = struct.unpack(">I", full[i : i + 4])
    body = full[i + 8 :]
    assert len(body) == size - 8
    large = (
        full[:i]
        + struct.pack(">I", 1)
        + b"mdat"
        + struct.pack(">Q", 16 + len(body))
        + body
    )
    assert mm.decode_mp4(large) == mm.decode_mp4(full)


def test_mp3_truncation_and_mutation():
    import pytest
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from neo4j_dynagraph_spark.operators import multimodal as mm

    @settings(max_examples=120, deadline=None)
    @given(mid=st.integers(0, 10_000), frac=st.floats(0.0, 1.0))
    def check_trunc(mid, frac):
        full = mm.mp3_fixture(mid)
        cut = full[: int(len(full) * frac)]
        # MP3 is a self-framing stream: a cut exactly ON a frame
        # boundary is VALID (that many whole frames) — unlike PNG's
        # length-bearing container; only a mid-frame cut must raise
        kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                224, 256, 320, 0][1 + mid % 14] * 1000
        rate = [44100, 48000, 32000][mid % 3]
        bounds, pos = {0}, 0
        for f in range(3 + mid % 9):
            pos += (144 * kbps) // rate + (mid + f) % 2
            bounds.add(pos)
        if len(cut) in bounds and len(cut) > 0:
            got = mm.decode_mp3_frames(cut)
            assert got["n_bytes"] == len(cut)
        else:
            with pytest.raises(ValueError):
                mm.decode_mp3_frames(cut)

    check_trunc()

    # flipping a HEADER bit is either rejected (sync loss, reserved
    # index, layer mismatch, mid-frame landing) or yields a walk that
    # still lands EXACTLY on EOF — CRC-less MP3 has no stronger
    # integrity than its framing, so a flipped bitrate/padding bit
    # CAN produce a different internally-consistent walk; what the
    # walker guarantees is that it never returns from a stream whose
    # frame arithmetic does not tile the payload
    full = mm.mp3_fixture(77)
    rejected = 0
    for i in range(4):
        for bit in (0x01, 0x80, 0x40):
            mut = bytearray(full)
            mut[i] ^= bit
            try:
                got = mm.decode_mp3_frames(bytes(mut))
            except ValueError:
                rejected += 1
                continue
            assert got["n_bytes"] == len(mut)
    assert rejected >= 6  # most single-bit header flips must reject


def _py_si_removed(contacts, seed_mod, p10, max_hops, removed):
    """SI over the contact set with `removed` actors deleted."""
    kept = [
        (f, a, b)
        for f, a, b in contacts
        if a not in removed and b not in removed
    ]
    inf = _py_si(kept, seed_mod, p10, max_hops)
    return {v: t for v, t in inf.items() if v not in removed}


def test_si_immunized_differential(spark):
    """All three policy lanes == pure-Python replays: the greedy
    degree-discount picks, the hash-smallest random draw, and the SI
    under each removal; a removed lane can never infect MORE than
    baseline (path-subset argument)."""
    pairs = sorted({(min(a, b), max(a, b)) for _, a, b in CONTACTS})
    k = 2
    targeted = {a for _, a, _, _ in _py_degree_discount(pairs, k, 3)}
    nodes = {a for _, a, _ in CONTACTS} | {b for _, _, b in CONTACTS}
    rand = set(sorted(nodes, key=lambda v: (_h64(f"rv:{v}"), v))[:k])
    rows = {
        r.policy: r
        for r in graph.si_immunized(
            _si_df(spark), k=k, seed_mod=2, p10=5, max_hops=6
        ).collect()
    }
    base = _py_si(CONTACTS, 2, 5, 6)
    expect = {
        "baseline": (set(), base),
        "random": (rand, _py_si_removed(CONTACTS, 2, 5, 6, rand)),
        "targeted": (targeted, _py_si_removed(CONTACTS, 2, 5, 6, targeted)),
    }
    for pol, (rm, inf) in expect.items():
        r = rows[pol]
        assert r.n_removed == len(rm), pol
        assert r.n_seeds == sum(1 for t in inf.values() if t < 0), pol
        assert r.n_infected == sum(1 for t in inf.values() if t >= 0), pol
        assert r.n_infected <= rows["baseline"].n_infected


def test_wl_day_similarity_structural_twins(spark):
    """Two days with the SAME contact shape on disjoint actor sets
    must score wl_jaccard 1.0 (structural, not identity); a clique
    day vs a path day must score < 1; output covers every day pair
    including zero-overlap ones."""
    tri_day0 = [(1, 11, 12), (1, 12, 13), (1, 11, 13)]
    tri_day1 = [(30, 21, 22), (30, 22, 23), (30, 21, 23)]
    path_day2 = [(55, 31, 32), (55, 32, 33), (56, 33, 34)]
    e = spark.createDataFrame(
        tri_day0 + tri_day1 + path_day2,
        "frame_id long, actor1 long, actor2 long",
    )
    rows = {
        (r.day_a, r.day_b): r
        for r in graph.wl_day_similarity(e, rounds=2).collect()
    }
    assert len(rows) == 3  # all 3 day pairs present
    d0, d1, d2 = 0, 1, 2
    assert rows[(d0, d1)].wl_jaccard == 1.0
    assert rows[(d0, d2)].wl_jaccard < 1.0
    assert rows[(d0, d2)].n_a == 3 and rows[(d0, d2)].n_b == 4


# --------------------------------------------------------- rank-1 MF


def test_mf_rank1_converges_and_recommends_unrated(spark):
    """The GD fit must monotonically reduce MSE on a small planted
    rating matrix, and factor signs/scale must stay sane; the rec
    terminal can only surface unrated items."""
    from neo4j_dynagraph_spark.operators.similarity import mf_rank1

    rows = [
        (1, 10, 5.0), (1, 11, 3.0), (2, 10, 4.0), (2, 12, 1.0),
        (3, 11, 2.0), (3, 12, 5.0), (4, 10, 5.0), (4, 11, 4.0),
    ]
    rt = spark.createDataFrame(rows, "cust long, part long, r double")

    def mse(u, v):
        j = (
            rt.crossJoin(rt.agg(F.max("r").alias("m")))
            .select("cust", "part", (F.col("r") / F.col("m")).alias("rn"))
            .join(u, "cust").join(v, "part")
        )
        return j.select(
            F.avg((F.col("rn") - F.col("u") * F.col("v")) ** 2).alias("m")
        ).collect()[0].m

    losses = []
    for steps in (0, 4, 8):
        u, v = mf_rank1(rt, steps=steps, lr=0.5, reg=0.01)
        losses.append(mse(u, v))
    assert losses[0] > losses[1] > losses[2]
    # determinism: same steps twice -> identical factors
    u1, v1 = mf_rank1(rt, steps=4, lr=0.5, reg=0.01)
    u2, v2 = mf_rank1(rt, steps=4, lr=0.5, reg=0.01)
    assert sorted(map(tuple, u1.collect())) == sorted(map(tuple, u2.collect()))
    assert sorted(map(tuple, v1.collect())) == sorted(map(tuple, v2.collect()))


def test_mf_rank1_factors_positive_at_testdata(spark):
    """q_mf_recs' de-cartesianed candidate window ranks by (v desc,
    part) and claims that equals u*v score order — true iff every
    fitted u is positive. Pin it on the real sf0.001 ratings (0.1
    init, nonnegative ratings, mean gradients keep factors in the
    positive cone at our lr/reg)."""
    from neo4j_dynagraph_spark.operators.similarity import mf_rank1
    from neo4j_dynagraph_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    od = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey"
    )
    rt = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("r"))
    )
    u, v = mf_rank1(rt, steps=8, lr=0.5, reg=0.01)
    assert u.where(F.col("u") <= 0).count() == 0
    assert v.where(F.col("v") <= 0).count() == 0
