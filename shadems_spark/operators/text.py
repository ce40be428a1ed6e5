"""Text-analysis operators for training-data pipelines (SURVEY.md §2
M4/M5 + north-star text ops): tokenization, document stats, quality
scoring, token counting, rolling-hash fingerprinting, and an n-gram
language-ID heuristic.

Everything except lang-ID profiles is a pure Column expression over
`split`/`transform`/`aggregate` — JVM-side, no UDFs, linear scans that
scale to any corpus size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 1_000_000_007


def words(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def word_buckets(text: Column | str, d: int) -> Column:
    """Hashed bag-of-words bucket per word: the 'hashing trick'
    projection shared by the feature-hash / quality-classifier / DSIR
    queries.  Each word folds through the 31-polynomial char hash mod
    FP_MOD, then mod ``d`` — all JVM HOF lambdas, and the identical
    polynomial runs in the DuckDB oracles (list_reduce), so every
    consumer is exactly oracle-checkable.

    NB: HOF lambdas here are one-parameter only — PySpark treats a
    two-parameter lambda (even with a default) as the (element, index)
    form and would silently bind the index.

    Computed by the vectorized Arrow batch hasher by default (guide
    §4.2 — the JVM HOF fold is CodegenFallback, interpreting per
    char); ``SHADEMS_POLY_IMPL=jvm`` dispatches the original Column
    form (A/B + differential spec; equality pinned in
    tests/test_text_vector.py and tests/test_guards.py)."""
    import os

    if os.environ.get("SHADEMS_POLY_IMPL") == "jvm":
        ws = F.filter(words(text), lambda w: F.length(w) > 0)
        word_hash = lambda w: (
            F.aggregate(
                F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("long")),
                F.lit(0).cast("long"),
                lambda a, c: (a * F.lit(31) + c) % F.lit(FP_MOD),
            )
            % F.lit(d)
        )
        return F.transform(ws, word_hash)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _buckets(texts: pd.Series) -> pd.Series:
        return _word_buckets_numpy(texts, d)

    c = F.col(text) if isinstance(text, str) else text
    return _buckets(c)


def _word_buckets_numpy(texts: "pd.Series", d: int) -> "pd.Series":
    """Vectorized twin of the word_buckets JVM pipeline: split, drop
    empty tokens, 31-poly char hash mod FP_MOD per word, mod ``d`` —
    order preserved, no dedup, null text -> null array."""
    import numpy as np

    notnull_pos, flat, doc_lens = _flatten_docs(texts, keep_empty=False)
    if not notnull_pos:
        return pd.Series([None] * len(texts), dtype=object)
    wh, _, _ = _hash_words(flat)
    return _emit(texts, notnull_pos, wh % d, doc_lens)


def _sliding(ws: Column, n: int, combine) -> Column:
    """Sliding-window fold over ``n`` aligned shifted slices of ``ws``.

    zip_with over pre-shifted slices is O(len) total per row; the naive
    transform(sequence, i -> f(slice(ws, i, n))) alternative re-slices
    per position (O(len·n)) and measured 4x slower at sf0.1."""
    length = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    acc = F.slice(ws, 1, length)
    for i in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(ws, i, length), combine)
    return acc


def word_ngrams(ws: Column, n: int = 3, distinct: bool = True) -> Column:
    """Sequence-sensitive word n-grams (the shingle set for dedup)."""
    grams = _sliding(ws, n, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(grams) if distinct else grams


#: gram-combine multiplier for the cross-engine n-gram hash family
#: (any odd constant > 31 works; fixed by protocol so DuckDB replays)
XE_MULT = 131


def poly_word_hashes(ws: Column) -> Column:
    """Element-wise 31-poly char hash mod FP_MOD over a word array —
    the cross-engine twin of ``transform(ws, xxhash64)`` (DuckDB
    replays it with list_transform + list_reduce, the _LR_HASH
    shape).  ~30-bit domain: collision odds are birthday(FP_MOD), fine
    for minhash-style sketches where the estimator tolerates rare
    collisions; use xxhash64 when 64-bit keys matter and no oracle
    does."""
    return F.transform(
        ws,
        lambda w: F.aggregate(
            F.transform(F.split(w, ""), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda a, c: (a * F.lit(31) + c) % F.lit(FP_MOD),
        ),
    )


def _xe_grams_loop(texts: "pd.Series", n: int) -> "pd.Series":
    """Reference per-row implementation of the xe gram identity (kept
    for A/B interleaving and as the executable spec the vectorized
    path is pinned against)."""
    memo: dict[str, int] = {}
    out = []
    for t in texts:
        if t is None:  # JVM twin: null text -> null gram array
            out.append(None)
            continue
        hs = []
        for w in t.split(" "):
            if not w:
                continue
            h = memo.get(w)
            if h is None:
                a = 0
                for ch in w:
                    a = (a * 31 + ord(ch)) % FP_MOD
                memo[w] = a
                h = a
            hs.append(h)
        gs = []
        for i in range(len(hs) - n + 1):
            acc = hs[i]
            for j in range(1, n):
                acc = (acc * XE_MULT + hs[i + j]) % FP_MOD
            gs.append(acc)
        out.append(list(dict.fromkeys(gs)))
    return pd.Series(out, dtype=object)


def _flatten_docs(texts: "pd.Series", keep_empty: bool):
    """Split a batch of texts into (notnull positions, flat word list,
    per-doc word counts) — the shared front half of every vectorized
    gram builder.  ``keep_empty`` mirrors the two JVM split semantics:
    words() keeps empty tokens, the xe family filters them."""
    import numpy as np

    notnull_pos: list[int] = []
    doc_words: list[list[str]] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        notnull_pos.append(i)
        ws_ = t.split(" ")
        doc_words.append(ws_ if keep_empty else [w for w in ws_ if w])
    flat: list[str] = []
    for ws_ in doc_words:
        flat.extend(ws_)
    doc_lens = np.fromiter(
        (len(ws_) for ws_ in doc_words), dtype=np.int64, count=len(doc_words)
    )
    return notnull_pos, flat, doc_lens


def _poly_hash_flat(strs) -> tuple:
    """Vectorized 31-poly char hash mod FP_MOD of a sequence of
    strings: (hash array, codepoint-length array, pow31 table).

    Computed over a flat UTF-32 codepoint array — Python's ``ord`` ==
    the codepoint, and Spark's split('')/ascii() are codepoint-based
    too (verified including astral-plane chars), so the integers are
    identical to both the Python char loop and the JVM HOF fold.  All
    intermediates stay below 2^63: codepoint (<2^21) * pow31
    (<FP_MOD≈2^30) < 2^51, and per-string term sums add < FP_MOD
    each.  The pow31 table is sized max(len)+2 so callers can also
    look up 31^(len+1) for concat composition."""
    import numpy as np

    lens = np.fromiter((len(w) for w in strs), dtype=np.int64, count=len(strs))
    maxlen = int(lens.max()) if len(lens) else 0
    pow31 = np.ones(maxlen + 2, dtype=np.int64)
    for k in range(1, len(pow31)):
        pow31[k] = pow31[k - 1] * 31 % FP_MOD
    if not len(lens):
        return np.empty(0, dtype=np.int64), lens, pow31
    cps = np.frombuffer(
        "".join(strs).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    # char at global pos p in string k gets exponent (string end - 1 - p)
    exp = np.repeat(offs[1:], lens) - 1 - np.arange(len(cps))
    terms = cps * pow31[exp] % FP_MOD
    if maxlen == 0:
        return np.zeros(len(lens), dtype=np.int64), lens, pow31
    # sentinel 0 term keeps every reduceat index valid (a zero-length
    # string's offset can equal len(terms)); its +0 never changes a
    # sum, and zero-length segments are masked to 0 below anyway
    terms = np.concatenate((terms, [0]))
    hashes = np.add.reduceat(terms, offs[:-1]) % FP_MOD
    hashes[lens == 0] = 0
    return hashes, lens, pow31


def _hash_words(flat: list):
    """Factorize a flat word list and hash the uniques once:
    (per-occurrence hash, per-occurrence codepoint length, pow31)."""
    import numpy as np

    if not flat:
        e = np.empty(0, dtype=np.int64)
        return e, e, np.ones(2, dtype=np.int64)
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    whash, wlens, pow31 = _poly_hash_flat(list(uniques))
    return whash[codes], wlens[codes], pow31


def _window_starts(counts, width: int):
    """Flat start indices of every length-``width`` sliding window over
    variable-length segments: (windows per segment, flat starts, the
    segment index of each window)."""
    import numpy as np

    nw = np.maximum(counts - (width - 1), 0)
    w_offs = np.concatenate(([0], np.cumsum(nw)))
    wdoc = np.repeat(np.arange(len(counts)), nw)
    elem_offs = np.concatenate(([0], np.cumsum(counts)))
    starts = elem_offs[:-1][wdoc] + (np.arange(int(nw.sum())) - w_offs[wdoc])
    return nw, starts, wdoc


def _dedup_first(doc_idx, vals, n_docs: int):
    """First-occurrence dedup of ``vals`` (< 2^31, e.g. mod FP_MOD)
    within each doc: np.unique(return_index) on packed (doc, val)
    keys keeps first hits; re-sorting the kept indices restores
    within-doc order.  Returns (kept values, per-doc kept counts)."""
    import numpy as np

    keep = np.sort(np.unique(doc_idx * (1 << 31) + vals, return_index=True)[1])
    kept_doc = doc_idx[keep]
    counts = np.bincount(kept_doc, minlength=n_docs)
    return vals[keep], counts


def _emit(texts, notnull_pos, kept, counts) -> "pd.Series":
    """Scatter per-doc slices of ``kept`` back to Series positions."""
    import numpy as np

    out: list = [None] * len(texts)
    k_offs = np.concatenate(([0], np.cumsum(counts)))
    for d, i in enumerate(notnull_pos):
        out[i] = kept[k_offs[d]:k_offs[d + 1]].tolist()
    return pd.Series(out, dtype=object)


def _xe_grams_numpy(texts: "pd.Series", n: int) -> "pd.Series":
    """NumPy-vectorized twin of :func:`_xe_grams_loop` — identical
    integers, no per-char Python loop.  The batch's words are
    factorized and hashed once (:func:`_poly_hash_flat` over a flat
    UTF-32 codepoint array); the gram fold is n shifted gathers;
    first-occurrence dedup is one np.unique over (doc, gram) keys."""
    notnull_pos, flat, doc_lens = _flatten_docs(texts, keep_empty=False)
    if not notnull_pos:
        return pd.Series([None] * len(texts), dtype=object)
    wh, _, _ = _hash_words(flat)
    ng, starts, gram_doc = _window_starts(doc_lens, n)
    if len(starts):
        acc = wh[starts].copy()
        for j in range(1, n):
            acc = (acc * XE_MULT + wh[starts + j]) % FP_MOD
        kept, counts = _dedup_first(gram_doc, acc, len(doc_lens))
    else:
        import numpy as np

        kept = np.empty(0, dtype=np.int64)
        counts = np.zeros(len(doc_lens), dtype=np.int64)
    return _emit(texts, notnull_pos, kept, counts)


def _winnow_numpy(texts: "pd.Series", k: int, w: int) -> "pd.Series":
    """NumPy-vectorized twin of the winnow() column pipeline:
    gram_hashes_poly(words(text), k) -> sliding w-window least ->
    array_distinct.  Identical integers at every step:

    - words() KEEPS empty tokens (unlike the xe family), so the flat
      split keeps them too; an empty word hashes to 0 with length 0,
      exactly the JVM fold.
    - the k-gram STRING hash is composed from per-word hashes without
      building gram strings: appending " "+word to a prefix with hash
      H is H' = ((H*31 + 32) % M * 31^len(word) + hash(word)) % M —
      the space is codepoint 32 and poly concat is linear.  Each
      product stays < FP_MOD^2 < 2^60.
    - the window min is w-1 shifted np.minimum passes; array_distinct
      keeps first occurrences (same np.unique trick as the grams)."""
    import numpy as np

    notnull_pos, flat, doc_lens = _flatten_docs(texts, keep_empty=True)
    if not notnull_pos:
        return pd.Series([None] * len(texts), dtype=object)
    wh, wlen, pow31 = _hash_words(flat)
    ng, gstarts, _ = _window_starts(doc_lens, k)
    if len(gstarts):
        acc = wh[gstarts].copy()
        for j in range(1, k):
            acc = (
                (acc * 31 + 32) % FP_MOD * pow31[wlen[gstarts + j]]
                + wh[gstarts + j]
            ) % FP_MOD
    else:
        acc = np.empty(0, dtype=np.int64)
    nw, mstarts, mdoc = _window_starts(ng, w)
    if len(mstarts):
        mins = acc[mstarts].copy()
        for j in range(1, w):
            np.minimum(mins, acc[mstarts + j], out=mins)
        kept, counts = _dedup_first(mdoc, mins, len(doc_lens))
    else:
        kept = np.empty(0, dtype=np.int64)
        counts = np.zeros(len(doc_lens), dtype=np.int64)
    return _emit(texts, notnull_pos, kept, counts)


def _xe_grams_flat(arr, n: int):
    """Core of :func:`_xe_grams_pa`: the batch's kept gram hashes as
    one flat int64 array plus the per-doc counts and the null mask —
    shared by the ListArray builder and the fused (doc, gram)-row
    generator (r12, VERDICT r11 #5)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    splits = pc.split_pattern(arr, " ")
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    doc_lens = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    doc_lens = np.where(null_mask, 0, doc_lens).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = enc.dictionary.to_pylist()
    uhash, ulens, _ = _poly_hash_flat(uniques)
    # xe family: drop empty tokens BEFORE the windows
    occ_doc = np.repeat(np.arange(len(doc_lens)), doc_lens)
    nonempty = ulens[codes] > 0 if len(codes) else np.empty(0, dtype=bool)
    wh = uhash[codes[nonempty]] if len(codes) else np.empty(0, dtype=np.int64)
    doc_lens_f = np.bincount(occ_doc[nonempty], minlength=len(doc_lens))
    ng, starts, gram_doc = _window_starts(doc_lens_f, n)
    if len(starts):
        acc = wh[starts].copy()
        for j in range(1, n):
            acc = (acc * XE_MULT + wh[starts + j]) % FP_MOD
        kept, counts = _dedup_first(gram_doc, acc, len(doc_lens))
    else:
        kept = np.empty(0, dtype=np.int64)
        counts = np.zeros(len(doc_lens), dtype=np.int64)
    return kept, counts, null_mask


def _xe_grams_pa(arr, n: int):
    """Arrow-native twin of :func:`_xe_grams_loop`: pyarrow
    split_pattern + dictionary_encode do the split/factorize in C;
    only the batch's UNIQUE words are materialized as Python strings
    (for the exact UTF-32 codepoint hash); the gram fold, empty-word
    filter and first-occurrence dedup are NumPy; output is a
    ListArray<int64> built with zero per-row Python."""
    import numpy as np
    import pyarrow as pa

    kept, counts, null_mask = _xe_grams_flat(arr, n)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # a ListArray's int32 offsets would silently WRAP past 2^31 kept
    # grams per batch (unreachable at default Arrow batch sizes, but
    # unchecked would corrupt rather than fail — ADVICE r11)
    assert offsets[-1] < 2**31, "gram count exceeds int32 ListArray offsets"
    offsets = offsets.astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(kept, type=pa.int64()),
        mask=pa.array(null_mask),
    )


def xe_gram_hashes_arrow(text: Column | str, n: int = 3) -> Column:
    """Arrow-batched twin of ``ngram_hashes_xe(words(text), n)`` —
    the SAME cross-engine gram identity (whitespace split, empty-word
    filter, 31-poly char hash mod FP_MOD per word, (acc*131 + h) mod
    FP_MOD gram fold, first-occurrence dedup), computed outside the
    JVM instead of nested higher-order functions.

    Why a UDF here, against the usual rule: Spark HOFs are
    CodegenFallback — the per-char lambda interprets at ~3 us/char,
    and the char fold dominated q_dedup_minhash's wall (gram build
    2.4 s of a ~3.4 s query at sf0.1).  The default body is the
    Arrow-native :func:`_xe_grams_pa` (guide §4.2: whole batches
    through pyarrow.compute + NumPy); ``SHADEMS_XE_GRAM_IMPL=numpy``
    dispatches the pandas/NumPy body, ``=loop`` the original per-row
    loop (A/B and differential testing — all three are pinned
    value-identical in tests/test_guards.py and
    tests/test_text_vector.py)."""
    import os

    c = F.col(text) if isinstance(text, str) else text
    impl = os.environ.get("SHADEMS_XE_GRAM_IMPL")
    if impl in ("loop", "numpy"):
        from pyspark.sql.functions import pandas_udf

        body = _xe_grams_loop if impl == "loop" else _xe_grams_numpy

        @pandas_udf("array<long>")
        def _grams(texts: pd.Series) -> pd.Series:
            return body(texts, n)

        return _grams(c)

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("array<long>")
    def _grams_pa(arr):
        return _xe_grams_pa(arr, n)

    return _grams_pa(c)


def _word_ngrams_loop(texts: "pd.Series", n: int) -> "pd.Series":
    """Reference per-row implementation of the string gram identity
    (kept for A/B interleaving and as the executable spec)."""
    out = []
    for t in texts:
        if t is None:  # JVM twin: null text -> null gram array
            out.append(None)
            continue
        ws = t.split(" ")
        gs = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        out.append(list(dict.fromkeys(gs)))
    return pd.Series(out, dtype=object)


def _word_ngrams_flat(arr, n: int):
    """Core of :func:`_word_ngrams_pa`: the batch's kept gram STRINGS
    as one flat Arrow string array plus per-doc counts and the null
    mask — shared by the ListArray builder and the fused
    (doc, gram)-row generator (r12, VERDICT r11 #5)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    splits = pc.split_pattern(arr, " ")
    null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(splits)
    doc_lens = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    doc_lens = np.where(null_mask, 0, doc_lens).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ng, starts, gram_doc = _window_starts(doc_lens, n)
    if len(starts):
        # pack the word-code tuple into one gram id, re-factorizing
        # after each step so values stay far below 2^63
        gid = codes[starts]
        for j in range(1, n):
            gid = pd.factorize(gid * len(enc.dictionary) + codes[starts + j])[0]
        # first-occurrence dedup per doc (array_distinct semantics);
        # gid < #windows < 2^31 after factorize, so packing is exact
        keep = np.sort(np.unique(gram_doc * (1 << 31) + gid, return_index=True)[1])
        counts = np.bincount(gram_doc[keep], minlength=len(doc_lens))
        parts = [flat.take(pa.array(starts[keep] + j)) for j in range(n)]
        kept_str = (
            pc.binary_join_element_wise(*parts, " ") if n > 1 else parts[0]
        )
    else:
        counts = np.zeros(len(doc_lens), dtype=np.int64)
        kept_str = pa.array([], type=pa.string())
    return kept_str, counts, null_mask


def _word_ngrams_pa(arr, n: int):
    """Arrow-native twin of :func:`_word_ngrams_loop`: pyarrow
    split_pattern (verified identical to str.split(" ") including
    empty-token and empty-string edges), dictionary-encoded words,
    NumPy window/dedup machinery, and ONE binary_join_element_wise to
    build only the KEPT gram strings — no per-row Python anywhere;
    the batch goes ChunkedArray -> ListArray with no Python objects
    materialized."""
    import numpy as np
    import pyarrow as pa

    kept_str, counts, null_mask = _word_ngrams_flat(arr, n)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    # a ListArray's int32 offsets would silently WRAP past 2^31 kept
    # grams per batch (unreachable at default Arrow batch sizes, but
    # unchecked would corrupt rather than fail — ADVICE r11)
    assert offsets[-1] < 2**31, "gram count exceeds int32 ListArray offsets"
    offsets = offsets.astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offsets), kept_str,
        mask=pa.array(null_mask),
    )


def doc_grams_fused(df, id_col: str, text: str, n: int, family: str):
    """Fused gram explode (r12; guide §4.2, VERDICT r11 #5): ONE
    MapInArrow emits the (id, gram) rows directly from the batch body
    — no intermediate ListArray and no downstream Generate node.
    Row-for-row identical to
    ``df.select(id, F.explode(<gram builder>(text, n)))``: null/empty
    docs emit no rows (plain-explode semantics; callers that need
    explode_outer keep the array form).

    ``family``: "xe" -> int64 gram hashes column ``s`` (the
    :func:`_xe_grams_flat` identity); "word" -> string grams column
    ``ng`` (:func:`_word_ngrams_flat`).  Only the two named columns
    cross the Python boundary (guide §4.1 column-diet rule)."""
    import numpy as np

    id_type = dict(df.dtypes)[id_col]
    out_name, out_type = ("s", "long") if family == "xe" else ("ng", "string")
    core = _xe_grams_flat if family == "xe" else _word_ngrams_flat

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            vals, counts, _ = core(batch.column(1), n)
            idx = pa.array(
                np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            )
            if not isinstance(vals, pa.Array):
                vals = pa.array(vals, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [ids.take(idx), vals], [id_col, out_name]
            )

    return df.select(id_col, text).mapInArrow(
        gen, f"{id_col} {id_type}, {out_name} {out_type}"
    )


def word_ngrams_arrow(text: Column | str, n: int = 3) -> Column:
    """Arrow-batched twin of ``word_ngrams(words(text), n)`` — the
    same STRING gram identity (space split with empties kept,
    space-joined n-gram, first-occurrence dedup), computed outside
    the JVM for the same CodegenFallback reason as
    :func:`xe_gram_hashes_arrow`.  The default body is the
    Arrow-native :func:`_word_ngrams_pa` (guide §4.2 — whole batches
    through pyarrow.compute, zero per-row Python);
    ``SHADEMS_XE_GRAM_IMPL=loop`` dispatches the original per-row
    pandas UDF (A/B + differential spec — pinned value-identical in
    tests/test_guards.py and tests/test_text_vector.py)."""
    import os

    c = F.col(text) if isinstance(text, str) else text
    if os.environ.get("SHADEMS_XE_GRAM_IMPL") == "loop":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def _grams(texts: pd.Series) -> pd.Series:
            return _word_ngrams_loop(texts, n)

        return _grams(c)

    from pyspark.sql.functions import arrow_udf

    @arrow_udf("array<string>")
    def _grams_pa(arr):
        return _word_ngrams_pa(arr, n)

    return _grams_pa(c)


def ngram_hashes_xe(ws: Column, n: int = 3, distinct: bool = True) -> Column:
    """Cross-engine hashed word n-grams: poly word hashes combined
    with the left fold (acc * XE_MULT + h) mod FP_MOD — products stay
    under 2^38, so plain BIGINT arithmetic is exact on both engines.
    Same sliding-slice shape (and cost profile) as
    :func:`ngram_hashes`; used where a DuckDB oracle must replay the
    gram identity (q_dedup_minhash).  Empty words are filtered BEFORE
    hashing (protocol): Spark's split keeps empty tokens around double
    spaces while DuckDB's string_split edge cases differ — filtering
    on both engines removes the divergence."""
    wh = poly_word_hashes(F.filter(ws, lambda w: F.length(w) > 0))
    grams = _sliding(
        wh, n, lambda a, b: (a * F.lit(XE_MULT) + b) % F.lit(FP_MOD)
    )
    return F.array_distinct(grams) if distinct else grams


def ngram_hashes(ws: Column, n: int = 3, distinct: bool = True) -> Column:
    """Hashed word n-grams: xxhash64 each word once, combine windows
    with xxhash64(a, b) — pure int64 arithmetic, no string concat.

    Equality on the 64-bit gram hash stands in for gram equality
    (collision odds ~ birthday(2^64); negligible below ~10^9 distinct
    shingles per join key space).  This keeps shingle shuffles and
    join keys at 8 bytes/gram regardless of document size — the shape
    that survives a 100 TB corpus."""
    wh = F.transform(ws, lambda w: F.xxhash64(w))
    grams = _sliding(wh, n, lambda a, b: F.xxhash64(a, b))
    return F.array_distinct(grams) if distinct else grams


def text_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """M4: per-document stats — chars, words, distinct words,
    mean word length."""
    ws = words(text)
    return df.withColumns(
        {
            "n_chars_c": F.length(text).cast("long"),
            "n_words": F.size(ws).cast("long"),
            "n_uniq": F.size(F.array_distinct(ws)).cast("long"),
            "mean_word_len": F.round(
                F.aggregate(
                    F.transform(ws, lambda w: F.length(w).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.size(ws),
                4,
            ),
        }
    )


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish estimate
    (ceil(chars/4) — the standard subword-per-4-chars heuristic)."""
    return df.withColumns(
        {
            "ws_tokens": F.size(words(text)).cast("long"),
            "bpe_tokens": F.ceil(F.length(text) / F.lit(4.0)).cast("long"),
        }
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Quality scoring: bounded components for length, word length
    sanity, and lexical diversity — deterministic arithmetic so the
    oracle can mirror it exactly."""
    ws = words(text)
    n_words = F.size(ws).cast("double")
    n_uniq = F.size(F.array_distinct(ws)).cast("double")
    len_score = F.least(F.lit(1.0), F.length(text).cast("double") / F.lit(400.0))
    diversity = n_uniq / n_words
    return df.withColumn(
        "quality", F.round((len_score + diversity) / F.lit(2.0), 6)
    )


def fingerprint(df: DataFrame, text: str = "text", out: str = "fp") -> DataFrame:
    """Rolling-hash document fingerprint: fold (acc*31 + elem) mod p
    over per-word codes — order-sensitive, so reordered documents get
    different fingerprints (unlike bag-of-words hashes)."""
    elems = F.transform(
        words(text),
        lambda w: (F.length(w) * F.lit(7) + F.ascii(F.substring(w, 1, 1))).cast("long"),
    )
    acc = F.aggregate(
        elems,
        F.lit(0).cast("long"),
        lambda a, e: (a * F.lit(31) + e) % F.lit(FP_MOD),
    )
    return df.withColumn(out, acc)


def lang_profiles(df: DataFrame, text: str = "text", lang: str = "lang", top: int = 40) -> DataFrame:
    """Language-ID training pass: the ``top`` most frequent words per
    labeled language (an n-gram/stopword profile).  One aggregation
    over the corpus; the profile table is tiny and broadcastable."""
    from pyspark.sql import Window

    w = (
        df.select(lang, F.explode(words(text)).alias("w"))
        .groupBy(lang, "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = Window.partitionBy(lang).orderBy(F.col("n").desc(), F.col("w"))
    return w.withColumn("rk", F.row_number().over(rk)).filter(F.col("rk") <= top).drop("rk")


def lang_id(df: DataFrame, profiles: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Language-ID scoring pass: explode doc words, broadcast-join the
    profile table, pick argmax(match count, tie-break lang name) per
    doc.  Scales as one shuffle on doc_id."""
    from pyspark.sql import Window

    toks = df.select(id_col, F.explode(words(text)).alias("w"))
    scored = (
        toks.join(F.broadcast(profiles.select(F.col("lang").alias("cand"), "w")), "w")
        .groupBy(id_col, "cand")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    pick = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cand"))
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(id_col, F.col("cand").alias("pred_lang"), "score")
    )


def nfc_udf():
    """Unicode NFC normalization as an Arrow-batched pandas UDF — Spark
    has no normalization builtin (collations normalize for COMPARISON
    only); the per-batch ICU-equivalent (unicodedata) call is the
    sanctioned vectorized Python path.  Pure per-row map: no shuffle,
    embarrassingly parallel at any scale."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc


def strip_accents_udf():
    """Accent folding: NFD-decompose then drop combining marks (Mn) —
    the same rule utf8proc's strip_accents applies, so DuckDB can
    oracle-check it exactly for Latin text."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _strip(s: pd.Series) -> pd.Series:
        import unicodedata

        def f(x):
            if x is None:
                return None
            return "".join(
                ch
                for ch in unicodedata.normalize("NFD", x)
                if unicodedata.category(ch) != "Mn"
            )

        return s.map(f)

    return _strip


def bpe_train(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 50,
    sample_docs: int = 100,
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016) on a
    BOUNDED sample: the (word, freq) vocabulary of ``sample_docs``
    documents is collected to the driver (codebook-sized by contract,
    like PQ/IVF training) and the classic sequential merge loop runs
    in Python — BPE training is inherently sequential (every merge
    changes the pair statistics), so the distributed part of the
    pipeline is APPLICATION, not training, exactly as in production
    (train once on a sample, tokenize petabytes with the frozen
    merges).  Ties break lexicographically for determinism."""
    rows = (
        df.filter(F.col(id_col) < sample_docs)
        .select(F.explode(words(text)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    vocab = {tuple(r["w"]): r["n"] for r in rows if r["w"]}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple, int] = {}
        ab = best[0] + best[1]
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + n
        vocab = merged
    return merges


def bpe_tokenize_udf(merges: list[tuple[str, str]]):
    """Frozen-merges BPE application as an Arrow pandas UDF: per word,
    repeatedly merge the lowest-rank adjacent pair (the standard
    greedy decode).  The merge table rides into the executors via
    closure serialization (kilobytes); application is embarrassingly
    parallel — the 100-TB-side of the tokenizer."""
    from pyspark.sql.functions import pandas_udf

    ranks = {m: i for i, m in enumerate(merges)}

    def _word(w: str) -> list[str]:
        sym = list(w)
        while len(sym) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return sym

    @pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: [tok for w in (t or "").split(" ") if w for tok in _word(w)]
        )

    return _tok


def poly_hash(s: Column | str) -> Column:
    """31-polynomial char hash mod FP_MOD of a string Column — the
    shared cross-engine hash (DuckDB replays it with list_reduce over
    string_split(s, '')), used wherever a hash value must be IDENTICAL
    on both engines (bloom bits, winnowing fingerprints, feature
    buckets).  Pure HOF fold, JVM-side."""
    c = F.col(s) if isinstance(s, str) else s
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda a, ch: (a * F.lit(31) + ch) % F.lit(FP_MOD),
    )


def poly_hash_fast(s: Column | str) -> Column:
    """Drop-in twin of :func:`poly_hash` for DATA-SIZED string columns
    (exploded grams, token occurrences): same integers, computed by
    the vectorized batch hasher (:func:`_poly_hash_flat`) in one Arrow
    pandas UDF instead of the CodegenFallback per-char HOF fold
    (guide §4.2).  Set ``SHADEMS_POLY_IMPL=jvm`` on the driver to
    dispatch the JVM Column form (A/B + differential spec; equality
    pinned in tests/test_text_vector.py and tests/test_guards.py).
    Null in -> null out on both paths; keep :func:`poly_hash` for
    codebook-sized or expression-composed sites where a Python
    boundary costs more than it saves."""
    import os

    if os.environ.get("SHADEMS_POLY_IMPL") == "jvm":
        return poly_hash(s)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ph(strs: pd.Series) -> pd.Series:
        import numpy as np

        mask = strs.notna().to_numpy()
        vals = strs.to_numpy(dtype=object)
        h, _, _ = _poly_hash_flat([v for v, m in zip(vals, mask) if m])
        out = np.empty(len(vals), dtype=object)
        out[mask] = h
        out[~mask] = None
        return pd.Series(out, dtype=object)

    c = F.col(s) if isinstance(s, str) else s
    return _ph(c)


def winnow_fingerprints(ws: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word k-gram with the
    cross-engine poly hash, slide a w-hash window, keep the MINIMUM of
    each window, value-dedupe.  Guarantee: any two documents sharing a
    word run of length >= w + k - 1 share at least one fingerprint,
    while expected fingerprint density is only 2/(w+1) of the grams —
    the contract exact-substring dedup needs at a fraction of the
    index size.

    Pure Column composition: the k-gram build and the per-window min
    are both _sliding zip_with folds, so the whole selection is one
    JVM-side projection — no shuffle, no UDF; documents shorter than
    w + k - 1 words yield an empty array.

    PERFORMANCE: this fused Column duplicates the (expensive) gram-
    hash subtree once per window slice — measured 6.5x slower than
    the two-step DataFrame form at sf0.1.  Use ``winnow`` below for
    anything data-sized; this form is for small-data composition and
    tests."""
    mins = _sliding(gram_hashes_poly(ws, k), w, lambda a, b: F.least(a, b))
    return F.array_distinct(mins)


def gram_hashes_poly(ws: Column, k: int = 3) -> Column:
    """Poly-hashed word k-grams (cross-engine twin of ngram_hashes,
    non-distinct, order-preserving): hash each GRAM string with
    poly_hash — char-identical to the DuckDB list_reduce replay."""
    grams = _sliding(ws, k, lambda a, x: F.concat(a, F.lit(" "), x))
    return F.transform(grams, poly_hash)


def winnow(
    df: DataFrame,
    text: str = "text",
    k: int = 3,
    w: int = 4,
    out: str = "fps",
    keep: list[str] | None = None,
) -> DataFrame:
    """DataFrame-level winnowing: same semantics as
    ``winnow_fingerprints`` but with the gram-hash array materialized
    behind a PROJECTION BOUNDARY before the window-min fold.
    CollapseProject refuses to inline a non-cheap alias referenced by
    every one of the fold's w slices, so the hash array is computed
    ONCE per row instead of w times — measured 6.66 s -> 1.01 s at
    sf0.1 (the fused Column replicates the subtree per slice).

    ``keep`` lists passthrough columns (default: everything except
    ``text``).

    The fingerprint column is computed by the NumPy-vectorized Arrow
    twin :func:`_winnow_numpy` by default (guide §4.2 — the JVM HOF
    char fold is CodegenFallback, interpreting per char); set
    ``SHADEMS_POLY_IMPL=jvm`` on the driver to dispatch the original
    Column pipeline (A/B + differential spec — pinned value-identical
    in tests/test_text_vector.py and tests/test_guards.py)."""
    import os

    keep = keep if keep is not None else [c for c in df.columns if c != text]
    if os.environ.get("SHADEMS_POLY_IMPL") == "jvm":
        step = df.select(*keep, gram_hashes_poly(words(text), k).alias("__hs"))
        mins = _sliding(F.col("__hs"), w, lambda a, b: F.least(a, b))
        return step.select(*keep, F.array_distinct(mins).alias(out))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _fps(texts: pd.Series) -> pd.Series:
        return _winnow_numpy(texts, k, w)

    return df.select(*keep, _fps(F.col(text)).alias(out))
