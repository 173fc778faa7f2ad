"""Property tests for the SymSpell deletion-neighborhood discipline used
by entity_resolution (position-keyed, substitution error model) and
spell_correct (position-free keys, full edit-1 model).

These pin the RECALL-COMPLETENESS claims in the docstrings: blocking on
deletion variants must never miss a true edit-1 pair — if it could, the
downstream levenshtein verify would silently under-merge, which no
row-count or hash check against an identically-wrong oracle would catch.
No Spark session needed: the property is about the key algebra itself.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

ALPHABET = "abcdef0123456789"

words = st.text(alphabet=ALPHABET, min_size=2, max_size=12)


def deletion_variants(w: str) -> set[str]:
    """Position-free deletion neighborhood INCLUDING the word itself —
    exactly the spell_correct key set."""
    return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}


def positional_variants(w: str) -> set[tuple[int, str]]:
    """(position, variant) keys — exactly the entity_resolution key set
    (substitution-only error model)."""
    return {(i, w[:i] + w[i + 1 :]) for i in range(len(w))}


@given(words, st.data())
def test_position_free_neighborhood_catches_every_substitution(w, data):
    i = data.draw(st.integers(0, len(w) - 1))
    c = data.draw(st.sampled_from(ALPHABET))
    w2 = w[:i] + c + w[i + 1 :]
    assert deletion_variants(w) & deletion_variants(w2)


@given(words, st.data())
def test_position_free_neighborhood_catches_every_deletion(w, data):
    i = data.draw(st.integers(0, len(w) - 1))
    w2 = w[:i] + w[i + 1 :]
    assert deletion_variants(w) & deletion_variants(w2)


@given(words, st.data())
def test_position_free_neighborhood_catches_every_insertion(w, data):
    i = data.draw(st.integers(0, len(w)))
    c = data.draw(st.sampled_from(ALPHABET))
    w2 = w[:i] + c + w[i:]
    assert deletion_variants(w) & deletion_variants(w2)


@given(words, st.data())
def test_positional_neighborhood_catches_every_substitution(w, data):
    """The ER variant: same-position deletion keys collide for ANY
    single-character substitution (the planted error model)."""
    i = data.draw(st.integers(0, len(w) - 1))
    c = data.draw(st.sampled_from(ALPHABET))
    w2 = w[:i] + c + w[i + 1 :]
    assert positional_variants(w) & positional_variants(w2)


@given(words)
def test_neighborhood_size_is_linear(w):
    """Bucket fan-out is len+1 keys per record — the scale contract
    (an edit-2 neighborhood would be quadratic; we deliberately don't)."""
    assert len(deletion_variants(w)) <= len(w) + 1


# ---------------------------------------------------------------- winnowing
import hashlib

K, W = 5, 8


def _gram_hash(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:10], 16) % (1 << 40)


def winnow(text: str) -> set[int]:
    """Python mirror of q_winnowing_dup_pairs' selection: rightmost min
    of every W-window over K-gram hashes, via the same integer key
    encoding (hash * 4096 + (4096 - pos))."""
    hs = [
        _gram_hash(text[i : i + K]) for i in range(len(text) - K + 1)
    ]  # pos = i+1 (1-based)
    out = set()
    for end in range(W - 1, len(hs)):
        window = [
            hs[p] * 4096 + (4096 - (p + 1)) for p in range(end - W + 1, end + 1)
        ]
        out.add(min(window) // 4096)
    return out


@given(
    st.text(alphabet="abcdefgh ", min_size=12, max_size=40),
    st.text(alphabet="abcdefgh ", min_size=0, max_size=20),
    st.text(alphabet="abcdefgh ", min_size=0, max_size=20),
)
def test_winnowing_guarantee_shared_substring_shares_fingerprint(common, pre, post):
    """The Schleimer et al. guarantee: any common substring of length
    >= W + K - 1 (= 12) yields at least one shared fingerprint,
    REGARDLESS of how the substring is embedded in each document."""
    a = pre + common
    b = common + post
    assert winnow(a) & winnow(b)


@given(st.text(alphabet="abcdefgh ", min_size=12, max_size=60))
def test_winnowing_density_bound(text):
    """Selection density: at most one NEW fingerprint per window step,
    and at least one fingerprint overall (coverage)."""
    fps = winnow(text)
    n_windows = (len(text) - K + 1) - W + 1
    assert 1 <= len(fps) <= n_windows
