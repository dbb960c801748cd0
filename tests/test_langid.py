"""Trigram language-ID (operators/langid.py): accuracy pin on a
labeled fixture DISJOINT from the profile samples, plan gates
(broadcast hash join + partial agg before the exchange, no UDF), edge
cases, and profile determinism."""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.langid import (
    CONFUSABLE_GROUPS,
    LANG_SAMPLES,
    build_profiles,
    identify_language,
    trigrams,
)

from conftest import SF_DIR  # noqa: F401  (spark fixture wiring)

# labeled sentences NOT drawn from LANG_SAMPLES
FIXTURE = {
    "en": "a quiet library near the river stays open late on weekends for students and readers.",
    "de": "am wochenende besuchen wir gern das kleine museum in der altstadt und trinken danach kaffee.",
    "fr": "pendant les vacances, nous visitons souvent de petits villages où les boulangeries ouvrent tôt.",
    "es": "durante el verano solemos caminar por la playa y cenar pescado en un restaurante pequeño.",
    "it": "ogni domenica la nonna prepara la pasta fatta in casa e tutta la famiglia si riunisce a tavola.",
    "pt": "no inverno gostamos de ler livros perto da lareira enquanto a chuva cai lá fora.",
    "nl": "in de winter schaatsen veel mensen op de grachten als het ijs dik genoeg is.",
    "sv": "under sommaren åker många familjer till skärgården för att bada och fiska tillsammans.",
    "fi": "talvella lapset hiihtävät metsässä ja juovat kuumaa kaakaota takan ääressä illalla.",
    "hu": "ősszel a diákok visszatérnek az iskolába és a fák levelei sárgára meg pirosra váltanak.",
    "pl": "zimą często jeździmy w góry na narty a wieczorem pijemy gorącą herbatę z miodem.",
    "ru": "зимой мы часто катаемся на лыжах в лесу а вечером пьём горячий чай с мёдом дома.",
    "uk": "восени студенти повертаються до навчання а листя на деревах стає жовтим та червоним.",
    "el": "το καλοκαίρι πολλές οικογένειες ταξιδεύουν στα νησιά για να κολυμπήσουν στη θάλασσα.",
    "tr": "yazın aileler deniz kenarına gider ve akşamları balık lokantalarında yemek yer.",
    "ar": "في فصل الشتاء نجلس قرب النار ونقرأ الكتب بينما يسقط المطر في الخارج.",
    "he": "בחורף אנחנו יושבים ליד האח וקוראים ספרים בזמן שהגשם יורד בחוץ.",
    "hi": "सर्दियों में हम आग के पास बैठकर किताबें पढ़ते हैं और बाहर बारिश होती रहती है।",
    "th": "ในฤดูหนาวเรานั่งอ่านหนังสือใกล้กองไฟขณะที่ฝนตกอยู่ข้างนอก",
    "ja": "冬には暖炉のそばで本を読みながら、外で雨が降るのを聞くのが好きです。",
    "ko": "겨울에는 난로 옆에서 책을 읽으며 밖에 내리는 비 소리를 듣는 것을 좋아합니다.",
    "zh": "冬天我们喜欢坐在炉火旁读书，听着外面的雨声慢慢度过夜晚。",
    "vi": "vào mùa đông chúng tôi thích ngồi bên lò sưởi đọc sách và nghe tiếng mưa rơi bên ngoài.",
    "sw": "wakati wa baridi tunapenda kukaa karibu na moto tukisoma vitabu huku mvua ikinyesha nje.",
    "cs": "v zimě často lyžujeme na horách a večer pijeme horký čaj s medem u krbu.",
    "da": "om vinteren læser vi bøger ved pejsen mens regnen falder udenfor i mørket.",
    "no": "om vinteren leser vi bøker ved peisen mens regnet faller utenfor i mørket.",
    "ro": "iarna ne place să citim cărți lângă șemineu în timp ce afară plouă liniștit.",
    "id": "pada musim hujan kami suka membaca buku di dekat jendela sambil minum teh hangat.",
    "tl": "tuwing tag-ulan mahilig kaming magbasa ng libro sa tabi ng bintana habang umiinom ng mainit na tsaa.",
    "fa": "در زمستان کنار آتش می‌نشینیم و کتاب می‌خوانیم در حالی که باران می‌بارد.",
    "ur": "سردیوں میں ہم آگ کے پاس بیٹھ کر کتابیں پڑھتے ہیں جبکہ باہر بارش ہوتی ہے۔",
    "bn": "শীতকালে আমরা আগুনের পাশে বসে বই পড়ি আর বাইরে বৃষ্টি পড়ে।",
    "ta": "குளிர்காலத்தில் நாங்கள் நெருப்பின் அருகில் அமர்ந்து புத்தகங்கள் படிக்கிறோம்.",
    "ka": "ზამთარში ჩვენ ცეცხლთან ვსხდებით და წიგნებს ვკითხულობთ.",
    # r12 second wave: 20 more languages (script-unique Indic/SEA/
    # Caucasus additions + the Latin tail incl. the gl member of the
    # iberian confusable group)
    "te": "చలికాలంలో మేము మంట దగ్గర కూర్చొని పుస్తకాలు చదువుతాము.",
    "kn": "ಚಳಿಗಾಲದಲ್ಲಿ ನಾವು ಬೆಂಕಿಯ ಬಳಿ ಕುಳಿತು ಪುಸ್ತಕಗಳನ್ನು ಓದುತ್ತೇವೆ.",
    "ml": "തണുപ്പുകാലത്ത് ഞങ്ങൾ തീയുടെ അടുത്തിരുന്ന് പുസ്തകങ്ങൾ വായിക്കുന്നു.",
    "gu": "શિયાળામાં અમે આગ પાસે બેસીને પુસ્તકો વાંચીએ છીએ.",
    "pa": "ਸਰਦੀਆਂ ਵਿੱਚ ਅਸੀਂ ਅੱਗ ਕੋਲ ਬੈਠ ਕੇ ਕਿਤਾਬਾਂ ਪੜ੍ਹਦੇ ਹਾਂ।",
    "mr": "हिवाळ्यात आम्ही शेकोटीजवळ बसून पुस्तके वाचतो.",
    "ne": "जाडोमा हामी आगो नजिक बसेर किताबहरू पढ्छौं।",
    "si": "ශීත කාලයේදී අපි ගිනි අසල වාඩි වී පොත් කියවමු.",
    "my": "ဆောင်းရာသီတွင် ကျွန်ုပ်တို့သည် မီးအနီးတွင်ထိုင်၍ စာအုပ်များဖတ်ကြသည်။",
    "km": "នៅរដូវរងារ យើងអង្គុយក្បែរភ្លើងអានសៀវភៅ។",
    "lo": "ໃນລະດູໜາວ ພວກເຮົານັ່ງໃກ້ໄຟອ່ານປຶ້ມ.",
    "am": "በክረምት ወቅት እሳቱ አጠገብ ተቀምጠን መጽሐፍት እናነባለን።",
    "hy": "ձմռանը մենք նստում ենք կրակի մոտ և գրքեր կարդում։",
    "mn": "өвлийн улиралд бид галын дэргэд сууж ном уншдаг.",
    "is": "á veturna sitjum við við eldinn og lesum bækur meðan rigningin fellur úti.",
    "ga": "sa gheimhreadh suímid cois na tine agus léimid leabhair le chéile.",
    "mt": "fix-xitwa noqogħdu ħdejn in-nar u naqraw il-kotba flimkien.",
    "eu": "neguan sutondoan esertzen gara eta liburuak irakurtzen ditugu elkarrekin.",
    "gl": "no inverno sentamos preto do lume e lemos libros mentres chove fóra.",
    "cy": "yn y gaeaf rydyn ni'n eistedd wrth y tân ac yn darllen llyfrau gyda'n gilydd.",
}


def test_accuracy_pin_on_disjoint_fixture(spark):
    df = spark.createDataFrame(list(FIXTURE.items()), "label string, text string")
    got = {
        r["label"]: r["pred"]
        for r in identify_language(
            df, "text", id_col="label", out_col="pred"
        ).collect()
    }
    groups = {m: g for g in CONFUSABLE_GROUPS for m in g}
    strict = sum(1 for l, p in got.items() if p == l)
    hard_wrong = {
        l: p
        for l, p in got.items()
        if p != l and not (l in groups and p in groups.get(l, ()))
    }
    # outside the documented confusable groups, EVERYTHING must be
    # right; strict accuracy pinned >= 0.95 so silent profile decay
    # fails the suite
    assert not hard_wrong, hard_wrong
    assert strict / len(got) >= 0.95, (strict, len(got))


def test_und_for_null_short_and_unknown_script(spark):
    rows = [("a", None), ("b", "xy"), ("c", ""), ("d", "ᚠᚢᚦᚨᚱᚲ ᚠᚢᚦ ᚠᚢᚦ")]
    df = spark.createDataFrame(rows, "rid string, text string")
    got = dict(
        (r["rid"], r["p"])
        for r in identify_language(df, "text", id_col="rid", out_col="p").collect()
    )
    assert got == {"a": "und", "b": "und", "c": "und", "d": "und"}


def test_plan_broadcast_join_partial_agg_no_udf(spark):
    df = spark.createDataFrame(list(FIXTURE.items()), "label string, text string")
    out = identify_language(df, "text", id_col="label", out_col="p")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "partial_sum" in plan.lower() or "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # profile side must stay broadcast


def test_profiles_deterministic_and_normalized(spark):
    p1, p2 = build_profiles(), build_profiles()
    assert p1 == p2
    assert set(p1) == set(LANG_SAMPLES) and len(p1) >= 70
    for lang, w in p1.items():
        assert 0 < len(w) <= 120
        norm = sum(x * x for x in w.values()) ** 0.5
        assert abs(norm - 1.0) < 1e-9, lang
        assert all(x > 0 for x in w.values())


def test_trigram_extraction_matches_python(spark):
    texts = ["  The QUICK   brown fox ", "ab", "", "日本語 テスト", None]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["g"]
        for r in df.select("i", trigrams("t").alias("g")).collect()
    }

    def py_trigrams(t):
        if t is None:
            return []
        t = " ".join(t.lower().split())[:600]
        t = f" {t} "
        return [t[i:i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []

    for i, t in enumerate(texts):
        want = py_trigrams(t)
        assert (got[i] or []) == want, (i, got[i], want)


def test_score_margin_exposed_and_confident(spark):
    df = spark.createDataFrame(
        [("en", FIXTURE["en"]), ("zz", "q9 q9 q9")], "rid string, text string"
    )
    rows = {
        r["rid"]: r
        for r in identify_language(
            df, "text", id_col="rid", out_col="p", keep_score=True
        ).collect()
    }
    assert rows["en"]["p"] == "en" and rows["en"]["p_score"] > 0
    assert rows["zz"]["p"] == "und" and rows["zz"]["p_score"] == 0.0


def test_spark_matches_python_replay(spark):
    """Differential: the broadcast-join scorer reproduces a driver-side
    replay (same profiles, same trigrams, float-sum order-insensitive
    via margin assertion) on every fixture sentence."""
    from mongo_arrow_spark.operators.langid import _trigram_counts

    profiles = build_profiles()
    df = spark.createDataFrame(list(FIXTURE.items()), "label string, text string")
    got = {
        r["label"]: (r["p"], r["p_score"])
        for r in identify_language(
            df, "text", id_col="label", out_col="p", keep_score=True
        ).collect()
    }
    for label, text in FIXTURE.items():
        cnt = _trigram_counts(text[:600])
        scores = {
            lang: sum(c * w.get(t, 0.0) for t, c in cnt.items())
            for lang, w in profiles.items()
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        lang, sc = got[label]
        assert lang == best[0], (label, lang, best)
        assert abs(sc - best[1]) < 1e-9, (label, sc, best)


def test_min_score_confidence_floor(spark):
    """r12 verdict #5: ``min_score`` floors the argmax relative to doc
    trigram mass. At the documented 0.002: (a) every prediction on the
    55-language fixture is UNCHANGED (coverage intact — th/km/zh sit
    near 0.003 evidence-per-trigram, the binding constraint on the
    dial); (b) a near-zero-evidence doc — one real function word
    buried in a long digit page, per-trigram evidence ~1e-4 — flips to
    ``und`` instead of training a per-language LM tier on noise."""
    from mongo_arrow_spark.operators.langid import _profiles

    df = spark.createDataFrame(
        list(FIXTURE.items()), "label string, text string"
    )
    base = {
        r["label"]: r["p"]
        for r in identify_language(
            df, "text", id_col="label", out_col="p"
        ).collect()
    }
    floored = {
        r["label"]: r["p"]
        for r in identify_language(
            df, "text", id_col="label", out_col="p", min_score=0.002
        ).collect()
    }
    assert floored == base  # accuracy unchanged at the documented floor

    # self-calibrating weak doc: a MEDIAN-weight profile trigram of
    # one language, once, inside ~600 chars of digits — nonzero match,
    # per-trigram evidence far below any real sentence's
    prof = _profiles()["en"]
    ranked = sorted(prof, key=prof.get)
    tg = ranked[len(ranked) // 2].strip()
    digits = " ".join(["0123456789"] * 40)
    weak = spark.createDataFrame(
        [("w", f"{digits} {tg} {digits}")], "rid string, text string"
    )
    kw = dict(text_col="text", id_col="rid", out_col="p", keep_score=True)
    no_floor = identify_language(weak, **kw).first()
    assert no_floor["p_score"] > 0.0  # the trigram did match
    with_floor = identify_language(weak, min_score=0.002, **kw).first()
    assert with_floor["p"] == "und"
    # and the score column still reports the raw evidence for auditing
    assert with_floor["p_score"] == no_floor["p_score"]
