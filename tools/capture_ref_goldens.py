"""Capture text-frontend goldens by EXECUTING the reference implementation
(`/root/reference/text/english.py`) and recording its outputs.

The reference's heavy deps are absent in this image, so we stub exactly the
parts whose behavior does not matter for the captured corpus:

- `g2p_en.G2p`: only used for out-of-dictionary words -> every corpus
  sentence is checked to be fully in-CMUdict, and the stub raises if hit;
- `inflect`: only used by number expansion -> corpus has no digits, the
  stub raises if hit;
- `transformers.DebertaV2Tokenizer`: the spm model is not bundled in the
  reference checkout, so word grouping uses a whitespace/punctuation
  tokenizer that reproduces DeBERTa's `▁word` + bare-punct token stream for
  simple sentences (single-word pieces). The corpus sticks to common words
  where sentencepiece emits one `▁token` per word, so the grouping — and
  therefore word2ph — matches the real tokenizer.

Output: tests/goldens/en_ref_goldens.json rows of
  {text, norm_text, phones, tones, word2ph}

Run: python tools/capture_ref_goldens.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import re
import sys
import types

REF_TEXT = "/root/reference/text"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
    "en_ref_goldens.json",
)

SENTENCES = [
    "Hello world.",
    "How are you today?",
    "This is a test of the emergency broadcast system.",
    "The quick brown fox jumps over the lazy dog.",
    "I would like a cup of coffee, please.",
    "She sells sea shells by the sea shore.",
    "We are going to the park tomorrow morning.",
    "Can you hear me now?",
    "The weather is beautiful this afternoon.",
    "Please speak more slowly.",
    "Thank you very much for your help!",
    "Good morning, everyone.",
    "What time is it?",
    "My favorite color is blue.",
    "The train leaves at noon.",
    "He plays the piano very well.",
    "Reading books is a wonderful habit.",
    "The children are playing in the garden.",
    "I need to buy some milk and bread.",
    "Where is the nearest station?",
    "The sun rises in the east.",
    "Music brings people together.",
    "A journey of a thousand miles begins with a single step.",
    "Practice makes perfect.",
    "Knowledge is power.",
    "Time flies when you are having fun.",
    "Actions speak louder than words.",
    "The early bird catches the worm.",
    "Better late than never.",
    "Every cloud has a silver lining.",
    "Machine learning models require large amounts of data.",
    "The computer is processing your request.",
    "Artificial intelligence is changing the world.",
    "Speech synthesis converts text into spoken audio.",
    "Neural networks learn patterns from examples.",
    "The spacecraft landed safely on the moon.",
    "Scientists discovered a new species of butterfly.",
    "The orchestra performed a beautiful symphony.",
    "Students study mathematics and history at school.",
    "The chef prepared a delicious meal for the guests.",
    "Do you want some tea?",
    "It is raining outside.",
    "Close the door, please.",
    "The cat sleeps on the sofa.",
    "Birds sing in the morning.",
    "I love listening to music.",
    "The library opens at nine.",
    "He runs five miles every day.",
    "The movie starts in ten minutes.",
    "Winter is coming soon.",
    "The ocean is deep and blue.",
    "Flowers bloom in the spring.",
    "The mountain is covered with snow.",
    "We watched the sunset together.",
    "The baby is sleeping quietly.",
    "Keep calm and carry on.",
    "The meeting was very productive.",
    "Her voice sounds very pleasant.",
    "The engine makes a strange noise.",
    "They built a house near the river.",
    "The teacher explained the lesson clearly.",
    "I forgot my keys at home.",
    "The phone is ringing.",
    "Turn left at the next corner.",
    "The store is closed on Sunday.",
    "He wrote a letter to his friend.",
    "The bridge crosses the river.",
    "The garden is full of roses.",
    "She smiled and waved goodbye.",
    "The clock on the wall stopped.",
]


class _StubG2p:
    def __call__(self, word):
        raise RuntimeError(f"OOV word reached g2p_en stub: {word!r}")


class _StubInflect(types.ModuleType):
    def engine(self):
        class E:
            def __getattr__(self, name):
                def fail(*a, **k):
                    raise RuntimeError("inflect stub hit (digits in corpus?)")

                return fail

        return E()


class _StubSpmTokenizer:
    """Whitespace/punct tokenizer emitting DeBERTa-style pieces."""

    def tokenize(self, text):
        out = []
        for chunk in text.split():
            pieces = re.findall(r"[A-Za-z]+|[^A-Za-z]", chunk)
            for i, p in enumerate(pieces):
                out.append(("▁" + p) if i == 0 else p)
        return out


def load_reference_english():
    # stub deps BEFORE import
    g2p_mod = types.ModuleType("g2p_en")
    g2p_mod.G2p = _StubG2p
    sys.modules["g2p_en"] = g2p_mod
    sys.modules["inflect"] = _StubInflect("inflect")

    tr = types.ModuleType("transformers")

    class _Tok:
        @staticmethod
        def from_pretrained(path):
            return _StubSpmTokenizer()

    tr.DebertaV2Tokenizer = _Tok
    sys.modules["transformers"] = tr

    # alias package "text" -> reference/text WITHOUT running its __init__
    # (which imports pypinyin et al.)
    pkg = types.ModuleType("text")
    pkg.__path__ = [REF_TEXT]
    sys.modules["text"] = pkg
    spec = importlib.util.spec_from_file_location(
        "text.symbols", os.path.join(REF_TEXT, "symbols.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["text.symbols"] = mod
    spec.loader.exec_module(mod)
    # the real text/__init__.py star-imports text.symbols, so
    # `from text import symbols` resolves to the SYMBOL LIST, not the module
    pkg.symbols = mod.symbols

    spec = importlib.util.spec_from_file_location(
        "text.english", os.path.join(REF_TEXT, "english.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["text.english"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ref = load_reference_english()
    rows = []
    skipped = []
    for text in SENTENCES:
        norm = ref.text_normalize(text)
        # keep only fully in-dict sentences (no g2p_en in image)
        words = [w for w in re.findall(r"[A-Za-z']+", norm)]
        oov = [
            w
            for w in words
            if w.upper() not in ref.eng_dict
        ]
        if oov:
            skipped.append((text, oov))
            continue
        phones, tones, word2ph = ref.g2p(norm)
        rows.append(
            dict(
                text=text,
                norm_text=norm,
                phones=phones,
                tones=tones,
                word2ph=word2ph,
            )
        )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False, indent=1)
    print(f"captured {len(rows)} goldens -> {OUT}")
    for t, oov in skipped:
        print(f"skipped (OOV {oov}): {t}")


if __name__ == "__main__":
    main()
