"""Docs == artifacts (bench/check_docs.py in the suite): every headline
number quoted in README.md / SCALING.md must match the committed JSON
artifact it cites (r4 verdict item 7 -- drift fails loudly)."""

from bench import check_docs


def test_docs_match_artifacts():
    bad = []
    for doc, needle, why in check_docs.expected_strings():
        import os
        with open(os.path.join(check_docs.ROOT, doc)) as fh:
            if needle not in fh.read():
                bad.append((doc, needle, why))
    assert not bad, bad
