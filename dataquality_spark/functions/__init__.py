"""Model/scoring functions shared by the Spark pandas UDFs and the
pure-pandas oracle.

Importing this package tunes the glibc allocator for executor python
workers: by default malloc serves >128 KB allocations via fresh mmap and
returns them on free, so every Arrow batch's numpy temporaries touch
brand-new pages. On lazily-backed VMs (and busy hosts generally) that
first-touch cost measured 100×+ the arithmetic being done. Raising
M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps large buffers on the sbrk heap
where freed pages are reused, so steady-state batches run fault-free.
"""


def _tune_allocator() -> None:
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(ctypes.c_int(M_MMAP_THRESHOLD), ctypes.c_int(1 << 29))
        libc.mallopt(ctypes.c_int(M_TRIM_THRESHOLD), ctypes.c_int(1 << 29))
    except Exception:  # non-glibc platforms: best-effort no-op
        pass


_tune_allocator()


# ---------------------------------------------------------------------------
# Contract tokenizer (config.WORD_SPLIT_REGEX): a word is a maximal run
# of characters that are not ASCII whitespace (' ', '\n', '\t', '\r').
# Python's bare str.split() splits on ALL Unicode whitespace
# (\xa0,  , \x0b, ...) and silently diverges on HTML-extracted
# text — every word-level consumer (fused pipeline UDF, LM
# tokenization) must go through here, matching the pandas oracle's
# independent replace-based implementation.
# ---------------------------------------------------------------------------
def tokenize(text: str) -> list[str]:
    """ASCII-whitespace word split per the engine-wide contract.

    replace() is a C memchr scan per separator (near-free when the char
    is absent) — measured ~3× faster than the dict-based str.translate
    it replaces, with byte-identical output."""
    return [w for w in text.replace("\n", " ").replace("\t", " ")
            .replace("\r", " ").split(" ") if w]
