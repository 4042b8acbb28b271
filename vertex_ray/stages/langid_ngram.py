"""Hashed char-n-gram language ID — the fastText-shaped upgrade of the
4-language stopword heuristic (stages/text.lang_id_op): a multinomial
Naive-Bayes scorer over md5-hashed character TRIGRAMS, trained in one
bincount-combiner pass (the stages/text bigram-LM pattern, CCNet
arXiv:1911.00359 §3 / fastText arXiv:1607.01759 shape — hashed n-gram
features, linear scorer).

Everything is INTEGER-exact so a SQL engine can recompute the whole
model and every score bit-for-bit (the `_sql_bpe_train` /
md5-family discipline):

* normalization = ``lower`` + RE2 ``\\s+`` → one space (pyarrow and
  DuckDB run the same RE2);
* features = char trigrams of the normalized text, bucketed by
  ``md5_number_lower(gram) % n_buckets`` (stages/dedup_near md5
  family);
* per-language log-probs quantized to int64:
  ``floor(ln((c+1)/(n_l+B)) · 2^20 + 0.5)`` — scores are int64 dot
  products, argmax ties break by language name ascending.

Scale shape: training is per-batch ``bincount`` partials over
``lang × bucket`` (bounded L·B ints) merged by ONE tiny groupby; the
trained quantized matrix is broadcast via ``ray.put`` and scoring is a
stateless ``map_batches`` (L segmented ``reduceat`` passes per batch).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["LANGID_SEEDS", "langid_train_table", "train_langid",
           "langid_classify", "QUANT"]

QUANT = 1 << 20  # log-prob quantization (integer-exact scores)

# Deterministic multilingual training fixture: short original sentences
# per language (everyday register, heavy in each language's function
# words / diacritics — the signal char-trigram models key on).
LANGID_SEEDS: dict[str, list[str]] = {
    "de": [
        "der hund läuft schnell über die straße und bellt laut",
        "ich möchte heute abend mit meinen freunden essen gehen",
        "das wetter ist schön und die sonne scheint über den bergen",
        "können sie mir bitte sagen wo der bahnhof ist",
        "wir haben gestern ein neues buch über geschichte gelesen",
    ],
    "en": [
        "the quick brown fox jumps over the lazy dog near the river",
        "i would like to have dinner with my friends this evening",
        "the weather is nice and the sun is shining over the hills",
        "could you please tell me where the train station is",
        "we read a new book about history yesterday afternoon",
    ],
    "es": [
        "el perro corre rápido por la calle y ladra muy fuerte",
        "me gustaría cenar esta noche con mis amigos en casa",
        "el tiempo es bueno y el sol brilla sobre las montañas",
        "puede decirme por favor dónde está la estación de tren",
        "ayer leímos un libro nuevo sobre la historia de españa",
    ],
    "fr": [
        "le chien court vite dans la rue et aboie très fort",
        "je voudrais dîner ce soir avec mes amis à la maison",
        "le temps est beau et le soleil brille sur les montagnes",
        "pouvez vous me dire où se trouve la gare s'il vous plaît",
        "nous avons lu hier un nouveau livre sur l'histoire de france",
    ],
    "id": [
        "anjing itu berlari cepat di jalan dan menggonggong keras",
        "saya ingin makan malam dengan teman teman saya malam ini",
        "cuacanya bagus dan matahari bersinar di atas pegunungan",
        "bisakah anda memberi tahu saya di mana stasiun kereta",
        "kemarin kami membaca buku baru tentang sejarah indonesia",
    ],
    "it": [
        "il cane corre veloce per la strada e abbaia molto forte",
        "vorrei cenare questa sera con i miei amici a casa nostra",
        "il tempo è bello e il sole splende sopra le montagne",
        "può dirmi per favore dove si trova la stazione dei treni",
        "ieri abbiamo letto un nuovo libro sulla storia d'italia",
    ],
    "nl": [
        "de hond rent snel over de straat en blaft heel hard",
        "ik wil vanavond graag met mijn vrienden gaan eten",
        "het weer is mooi en de zon schijnt boven de bergen",
        "kunt u mij vertellen waar het station is alstublieft",
        "we hebben gisteren een nieuw boek over geschiedenis gelezen",
    ],
    "pt": [
        "o cão corre rápido pela rua e late muito alto",
        "eu gostaria de jantar esta noite com os meus amigos",
        "o tempo está bom e o sol brilha sobre as montanhas",
        "pode me dizer por favor onde fica a estação de trem",
        "ontem lemos um livro novo sobre a história de portugal",
    ],
    "sv": [
        "hunden springer snabbt över gatan och skäller högt",
        "jag skulle vilja äta middag med mina vänner i kväll",
        "vädret är fint och solen skiner över bergen i norr",
        "kan du snälla berätta för mig var tågstationen ligger",
        "vi läste en ny bok om historia igår eftermiddag",
    ],
    "tr": [
        "köpek sokakta hızlı koşuyor ve çok yüksek sesle havlıyor",
        "bu akşam arkadaşlarımla birlikte yemek yemek istiyorum",
        "hava güzel ve güneş dağların üzerinde parlıyor bugün",
        "lütfen bana tren istasyonunun nerede olduğunu söyler misiniz",
        "dün tarih hakkında yeni bir kitap okuduk öğleden sonra",
    ],
}


def langid_train_table() -> pa.Table:
    """The deterministic training fixture as a (lang, text) table."""
    langs, texts = [], []
    for lang in sorted(LANGID_SEEDS):
        for s in LANGID_SEEDS[lang]:
            langs.append(lang)
            texts.append(s)
    return pa.table({"lang": pa.array(langs, pa.string()),
                     "text": pa.array(texts, pa.string())})


def _normalize(col) -> np.ndarray:
    """lower + RE2 \\s+ → ' ' (both kernels RE2 → DuckDB parity)."""
    norm = pc.replace_substring_regex(pc.utf8_lower(col), r"\s+", " ")
    return norm.to_numpy(zero_copy_only=False)


def _trigram_buckets(texts: np.ndarray, n_buckets: int):
    """(doc_of, bucket) over char trigrams of normalized docs. Gram
    extraction is a per-doc slice loop (bounded by text length); the
    md5 hashing is vectorized once per DISTINCT gram (factorize)."""
    from vertex_ray.stages.dedup_near import _md5_hash64

    doc_of = []
    grams = []
    for d, s in enumerate(texts):
        if s is None or len(s) < 3:
            continue
        doc_of.extend([d] * (len(s) - 2))
        grams.extend(s[i:i + 3] for i in range(len(s) - 2))
    if not grams:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    h = _md5_hash64(np.array(grams, dtype=object))
    return (np.asarray(doc_of, dtype=np.int64),
            (h % np.uint64(n_buckets)).astype(np.int64))


def train_langid(ds, text_col: str = "text", lang_col: str = "lang",
                 n_buckets: int = 4096):
    """Distributed trainer: per-batch (lang, bucket) bincount partials →
    ONE groupby merge → quantized int64 log-prob matrix. Returns
    (langs sorted asc, Q int64 (L, B), q0 int64 (L,)) where q0 is the
    unseen-bucket smoothing score."""
    langs = None  # discovered from partials (bounded by L)

    def partial(t: pa.Table) -> pa.Table:
        texts = _normalize(t[text_col])
        lv = t[lang_col].to_numpy(zero_copy_only=False)
        doc_of, bk = _trigram_buckets(texts, n_buckets)
        if not len(doc_of):
            return pa.table({"lang": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        import pandas as pd

        codes, uniq = pd.factorize(lv[doc_of])
        cnt = np.bincount(codes * n_buckets + bk,
                          minlength=len(uniq) * n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "lang": pa.array(np.asarray(uniq, dtype=object)[nz // n_buckets],
                             pa.string()),
            "bucket": pa.array((nz % n_buckets).astype(np.int64)),
            "c": pa.array(cnt[nz].astype(np.int64)),
        })

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "bucket"]).sum("c").take_all())
    if not rows:
        raise ValueError("train_langid: empty training set")
    langs = sorted({r["lang"] for r in rows})
    lidx = {l: i for i, l in enumerate(langs)}
    counts = np.zeros((len(langs), n_buckets), dtype=np.int64)
    for r in rows:
        counts[lidx[r["lang"]], r["bucket"]] = r["sum(c)"]
    tot = counts.sum(axis=1)
    B = float(n_buckets)
    q = np.floor(np.log((counts + 1.0) / (tot[:, None] + B))
                 * QUANT + 0.5).astype(np.int64)
    q0 = np.floor(np.log(1.0 / (tot + B)) * QUANT + 0.5).astype(np.int64)
    return langs, q, q0


def langid_classify(ds, langs: list[str], q: np.ndarray,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = 4096):
    """Score + argmax per document. The quantized matrix is broadcast
    once (ray.put) and read per actor — never re-shipped per batch.
    The dense matrix carries the unseen-bucket smoothing value in its
    zero-count cells, so no separate default lookup is needed."""
    import ray

    qref = ray.put(q)
    lang_arr = np.array(langs, dtype=object)

    def score(t: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        texts = _normalize(t[text_col])
        doc_of, bk = _trigram_buckets(texts, n_buckets)
        n = len(t)
        n_grams = np.bincount(doc_of, minlength=n).astype(np.int64)
        scores = np.zeros((n, len(lang_arr)), dtype=np.int64)
        if len(doc_of):
            nz = n_grams > 0
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_grams, out=off[1:])
            starts = off[:-1][nz]
            for li in range(len(lang_arr)):
                # the dense matrix already carries the unseen-bucket
                # smoothing value (count 0 → q0), so scoring is one
                # gather + segmented integer reduceat per language
                scores[nz, li] = np.add.reduceat(qm[li][bk], starts)
        best = np.argmax(scores, axis=1)  # ties → lowest index (lang asc)
        lang = lang_arr[best]
        lang[n_grams == 0] = "und"
        top = scores[np.arange(n), best]
        top[n_grams == 0] = 0
        return pa.table({
            id_col: t[id_col],
            "lang": pa.array(lang, pa.string()),
            "score": pa.array(top, pa.int64()),
            "n_grams": pa.array(n_grams, pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")
