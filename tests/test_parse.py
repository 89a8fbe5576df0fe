"""Unit tests for the parsing operators (O14–O21) against a pure-Python
mirror of the reference semantics (get_text_from_s3_image.py:19-56)."""

import re

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    parse as P,
)

EMAIL_RE = re.compile(P.EMAIL_RE)
PHONE_RE = re.compile(P.PHONE_RE)


def ref_parse(lines):
    """Reference parse_textract_data semantics, independently re-derived."""
    doc = {"email": "", "addr": "", "phone_number": ""}
    for line in lines:
        emails = EMAIL_RE.findall(line)
        if emails:
            doc["email"] = emails[0]
        low = line.lower()
        if sum(1 for w in P.ADDR_STOPWORDS if w in low) >= 3:
            doc["addr"] = line
        phones = PHONE_RE.findall(line)
        if phones:
            doc["phone_number"] = phones[0]
    doc["company"], doc["name"], doc["job_title"] = lines[0], lines[1], lines[2]
    return doc


CASES = [
    [
        "aws",
        "Edy Kim",
        "Specialist Solutions Architect",
        "1 2Floor GS Tower, 508 Nonhyeon-ro, Gangnam-gu, Seoul 06141, Korea",
        "edy@amazon.com",
        "(+82 10) 1025 7049",
    ],
    ["NATION_2 Trading Co", "Customer#000000000", "FURNITURE Specialist",
     "Email: c000000000@nation2.example.com", "Tel: 02-0000-0000",
     "0 Teheran-ro, Gangnam-gu, Seoul, Korea",
     "alt contact z000000000@alt.example.com"],
    ["CompanyX", "Some Name", "Title Only", "no contact info here", "nothing", "nada"],
    ["A", "B", "C", "first a@b.co then c@d.org in one line",
     "Tel: 02-1234-5678", "Suite 77 Main Street"],
]


def test_parse_matches_reference_semantics(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "lines: array<string>")
    got = df.select(
        P.positional(F.col("lines"), 0).alias("company"),
        P.positional(F.col("lines"), 1).alias("name"),
        P.positional(F.col("lines"), 2).alias("job_title"),
        P.scan_email(F.col("lines")).alias("email"),
        P.scan_phone(F.col("lines")).alias("phone_number"),
        P.scan_addr(F.col("lines")).alias("addr"),
    ).collect()
    for row, lines in zip(got, CASES):
        exp = ref_parse(lines)
        for k in ("company", "name", "job_title", "email", "phone_number", "addr"):
            assert row[k] == exp[k], (k, lines, row[k], exp[k])


def test_md5_ids_match_hashlib(spark):
    import hashlib

    df = spark.createDataFrame([("edy",), ("poby_bizcard_0050.jpg",)], "v: string")
    got = [r["h"] for r in df.select(P.md5_id(F.col("v")).alias("h")).collect()]
    exp = [
        hashlib.md5(b"edy").hexdigest()[:8],
        hashlib.md5(b"poby_bizcard_0050.jpg").hexdigest()[:8],
    ]
    assert got == exp


def test_content_id_composite(spark):
    import hashlib

    df = spark.createDataFrame(
        [("Edy Kim", "edy@amazon.com", "(+82 10) 1025 7049")],
        "name: string, email: string, phone: string",
    )
    got = df.select(
        P.content_id(F.col("name"), F.col("email"), F.col("phone")).alias("c")
    ).collect()[0]["c"]
    raw = ":".join(
        s.lower() for s in ("Edy Kim", "edy@amazon.com", "(+82 10) 1025 7049")
    )
    assert got == hashlib.md5(raw.encode()).hexdigest()[:8]


def test_owner_from_key(spark):
    df = spark.createDataFrame(
        [("bizcard-raw-img/edy_bizcard_0046.jpg",)], "s3_key: string"
    )
    assert (
        df.select(P.owner_from_key(F.col("s3_key")).alias("o")).collect()[0]["o"]
        == "edy"
    )


def test_redact_pii_and_counts(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.parse import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("a@b.com and c.d@e-f.org", 2, 0),
            ("Tel: 02-1234-5678", 0, 1),
            ("no pii here", 0, 0),
        ],
        "t string, e int, p int",
    )
    ne, np_ = pii_counts(F.col("t"))
    got = df.select("t", "e", "p", ne.alias("ne"), np_.alias("np"),
                    redact_pii(F.col("t")).alias("r")).collect()
    for r in got:
        assert r.ne == r.e and r.np == r.p, r
    by = {r.t: r.r for r in got}
    assert "<EMAIL>" in by["a@b.com and c.d@e-f.org"]
    assert "@" not in by["a@b.com and c.d@e-f.org"]
    assert "<PHONE>" in by["Tel: 02-1234-5678"]
    assert by["no pii here"] == "no pii here"
