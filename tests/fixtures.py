"""The reference's de-facto golden input: the 11-record Kinesis fixture
embedded in upsert_bizcard_to_es.py:96-108 / upsert_bizcard_to_graph_db.py:
165-179 (3 owners — edy/poby/pororo — duplicate contents, reciprocal
edy↔poby cards, self-cards). Re-expressed as already-parsed D2 rows."""

ADDR = "1 2Floor GS Tower, 508 Nonhyeon-ro, Gangnam-gu, Seoul 06141, Korea"
CREATED = "2019-10-25T01:12:54Z"

_PEOPLE = {
    "edy": ("Edy Kim", "edy@amazon.com", "(+82 10) 1025 7049", "Specialist Solutions Architect"),
    "crong": ("Crong Lee", "crong@amazon.com", "(+82 10) 7433 9352", "Associate Solutions Architect"),
    "harry": ("Harry Jang", "harry@amazon.com", "(+82 10) 4218 8396", "Partner Solutions Architect"),
    "poby": ("Poby Kim", "poby@amazon.com", "(+82 10) 6430 0671", "Solutions Architect"),
    "pororo1": ("Pororo Kim", "pororo@amazon.com", "(+82 10) 0388 1679", "SA Manager"),
    "pororo2": ("Pororo Kim", "pororo@amazon.com", "(+82 10) 8957 0150", "SA Manager"),
    "rody": ("Rody Park", "rody@amazon.com", "(+82 10) 4323 7890", "Solutions Architect"),
}

# (owner, image_seq, person_key) — who holds whose card.
_CARDS = [
    ("edy", "0046", "edy"),
    ("edy", "0071", "crong"),
    ("edy", "0044", "harry"),
    ("edy", "0050", "poby"),
    ("poby", "0050", "poby"),
    ("poby", "0046", "edy"),
    ("poby", "0054", "pororo1"),
    ("poby", "0001", "rody"),
    ("pororo", "0093", "pororo2"),
    ("pororo", "0041", "crong"),
    ("pororo", "0030", "harry"),
]


def bizcard_text_rows():
    """Rows shaped like operators.ingest.parse_bizcard_text output."""
    rows = []
    for owner, seq, pkey in _CARDS:
        name, email, phone, job = _PEOPLE[pkey]
        rows.append(
            {
                "s3_bucket": "octember-use1",
                "s3_key": f"bizcard-raw-img/{owner}_bizcard_{seq}.jpg",
                "owner": owner,
                "company": "aws",
                "name": name,
                "job_title": job,
                "email": email,
                "phone_number": phone,
                "addr": ADDR,
                "created_at": CREATED,
            }
        )
    return rows
