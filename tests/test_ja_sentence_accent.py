"""Sentence-level (running text) JA pitch-accent evaluation — VERDICT r3
item 6: the round-3 eval scored isolated dictionary words only; pyopenjtalk
parity actually lives in accent PHRASES over running text (reference
text/japanese.py:405-430 derives accents from full-context labels: particles
attach to their head word's contour, the copula supplies a kernel only after
heiban heads, polite endings override the stem's kernel).

Each sentence is annotated with its accent phrases and the expected per-mora
H/L pattern per standard Tokyo (NHK accent dictionary) values, audited by
hand. The corpus deliberately includes verb-accent-shift cases the fallback
is known to simplify (te-form kernel shifts like taꜜbete) — those count as
misses; the gate is >=85% phrase accuracy.
"""

from bert_vits2_tpu.text import ja_fallback as jf
from bert_vits2_tpu.text.japanese import text_normalize

# (sentence, [(accent phrase surface, expected per-mora H/L), ...])
SENTENCES = [
    ("猫が魚を食べました。", [("猫が", "HLL"), ("魚を", "LHHH"), ("食べました", "LHHLL")]),
    ("犬が公園を走っています。", [("犬が", "LHL"), ("公園を", "LHHHH"), ("走っています", "LHHHHHL")]),
    ("雨が降っています。", [("雨が", "HLL"), ("降っています", "LHHHHL")]),
    ("水を飲みます。", [("水を", "LHH"), ("飲みます", "LHHL")]),
    ("先生は学校にいます。", [("先生は", "LHHLL"), ("学校に", "LHHHH"), ("います", "LHL")]),
    ("学生が本を読んでいます。", [("学生が", "LHHHH"), ("本を", "HLL"), ("読んでいます", "LHHHHL")]),
    ("友達と映画を見ました。", [("友達と", "LHHHH"), ("映画を", "HLLL"), ("見ました", "LHLL")]),
    ("母は料理を作っています。", [("母は", "HLL"), ("料理を", "HLLL"), ("作っています", "LHHHHHL")]),
    ("父は会社で働いています。", [("父は", "LHL"), ("会社で", "LHHH"), ("働いています", "LHHHHHHL")]),
    ("子供が大きい声で泣いています。", [("子供が", "LHHH"), ("大きい", "LHHL"), ("声で", "HLL"), ("泣いています", "LHHHHL")]),
    ("姉は手紙を書きました。", [("姉は", "LHH"), ("手紙を", "LHHH"), ("書きました", "LHHLL")]),
    ("兄は東京に住んでいます。", [("兄は", "HLL"), ("東京に", "LHHHH"), ("住んでいます", "LHHHHL")]),
    ("山に登りました。", [("山に", "LHL"), ("登りました", "LHHHLL")]),
    ("海で泳ぎたいです。", [("海で", "HLL"), ("泳ぎたいです", "LHHHLLL")]),
    ("空が青いです。", [("空が", "HLL"), ("青いです", "LHLLL")]),
    ("星がきれいです。", [("星が", "LHH"), ("きれいです", "HLLLL")]),
    ("月が出ています。", [("月が", "LHL"), ("出ています", "LHHHL")]),
    ("雪が降りました。", [("雪が", "LHL"), ("降りました", "LHHLL")]),
    ("風が強いです。", [("風が", "LHH"), ("強いです", "LHLLL")]),
    ("桜が咲きました。", [("桜が", "LHHH"), ("咲きました", "LHHLL")]),
    ("花を買いました。", [("花を", "LHL"), ("買いました", "LHHLL")]),
    ("木が高いです。", [("木が", "HL"), ("高いです", "LHLLL")]),
    ("森を歩きます。", [("森を", "LHH"), ("歩きます", "LHHHL")]),
    ("川で遊びました。", [("川で", "LHL"), ("遊びました", "LHHHLL")]),
    ("電車で学校に行きます。", [("電車で", "LHHH"), ("学校に", "LHHHH"), ("行きます", "LHHL")]),
    ("バスを待っています。", [("バスを", "HLL"), ("待っています", "LHHHHL")]),
    ("飛行機が飛んでいます。", [("飛行機が", "LHLLL"), ("飛んでいます", "LHHHHL")]),
    ("駅まで歩きました。", [("駅まで", "HLLL"), ("歩きました", "LHHHLL")]),
    ("車を売りました。", [("車を", "LHHH"), ("売りました", "LHHLL")]),
    ("自転車に乗ります。", [("自転車に", "LHLLL"), ("乗ります", "LHHL")]),
    ("道が長いです。", [("道が", "LHH"), ("長いです", "LHLLL")]),
    ("町が静かです。", [("町が", "LHL"), ("静かです", "HLLLL")]),
    ("朝ご飯を食べましたか。", [("朝ご飯を", "LHHLLL"), ("食べましたか", "LHHLLL")]),
    ("昼に散歩します。", [("昼に", "LHL"), ("散歩します", "LHHHHL")]),
    ("夜は本を読みます。", [("夜は", "HLL"), ("本を", "HLL"), ("読みます", "LHHL")]),
    ("今日は天気がいいです。", [("今日は", "HLL"), ("天気が", "HLLL"), ("いいです", "HLLL")]),
    ("明日は雨が降るでしょう。", [("明日は", "LHHL"), ("雨が", "HLL"), ("降るでしょう", "LHHHL")]),
    ("昨日は寒かったです。", [("昨日は", "LHLL"), ("寒かったです", "LHLLLLL")]),
    ("春が来ました。", [("春が", "HLL"), ("来ました", "LHLL")]),
    ("夏は暑いです。", [("夏は", "LHL"), ("暑いです", "LHLLL")]),
    ("秋の空が高いです。", [("秋の", "HLL"), ("空が", "HLL"), ("高いです", "LHLLL")]),
    ("冬は雪が降ります。", [("冬は", "LHL"), ("雪が", "LHL"), ("降ります", "LHHL")]),
    ("今は忙しいです。", [("今は", "HLL"), ("忙しいです", "LHHHLLL")]),
    ("時間がありません。", [("時間が", "LHHH"), ("ありません", "LHHHL")]),
    ("頭が痛いです。", [("頭が", "LHHL"), ("痛いです", "LHLLL")]),
    ("目が大きいです。", [("目が", "HL"), ("大きいです", "LHHLLL")]),
    ("手を洗いました。", [("手を", "HL"), ("洗いました", "LHHHLL")]),
    ("足が速いです。", [("足が", "LHL"), ("速いです", "LHLLL")]),
    ("声が小さいです。", [("声が", "HLL"), ("小さいです", "LHHLLL")]),
    ("顔を洗います。", [("顔を", "LHH"), ("洗います", "LHHHL")]),
    ("体が強いです。", [("体が", "LHHH"), ("強いです", "LHLLL")]),
    ("心が温かいです。", [("心が", "LHLL"), ("温かいです", "LHHHLLL")]),
    ("日本語を勉強しています。", [("日本語を", "LHHHH"), ("勉強しています", "LHHHHHHHL")]),
    ("英語を教えています。", [("英語を", "LHHH"), ("教えています", "LHHHHHL")]),
    ("宿題をしました。", [("宿題を", "LHHHH"), ("しました", "LHLL")]),
    ("試験が難しかったです。", [("試験が", "LHLL"), ("難しかったです", "LHHHLLLLL")]),
    ("問題を解きました。", [("問題を", "LHHHH"), ("解きました", "LHHLL")]),
    ("音楽を聞くのが好きです。", [("音楽を", "HLLLL"), ("聞くのが", "LHHH"), ("好きです", "LHLL")]),
    ("歌を歌いましょう。", [("歌を", "LHL"), ("歌いましょう", "LHHHHL")]),
    ("絵を描いています。", [("絵を", "HL"), ("描いています", "LHHHHHL")]),
    ("写真を撮りました。", [("写真を", "LHHH"), ("撮りました", "LHHLL")]),
    ("勉強しましょう。", [("勉強しましょう", "LHHHHHHL")]),
    ("練習します。", [("練習します", "LHHHHHL")]),
    ("質問があります。", [("質問が", "LHHHH"), ("あります", "LHHL")]),
    ("病院に行きました。", [("病院に", "LHHHH"), ("行きました", "LHHLL")]),
    ("薬を飲んでください。", [("薬を", "LHHH"), ("飲んでください", "HLLLLLL")]),
    ("医者を呼びました。", [("医者を", "LHH"), ("呼びました", "LHHLL")]),
    ("お金がありません。", [("お金が", "LHHH"), ("ありません", "LHHHL")]),
    ("財布を忘れました。", [("財布を", "LHHH"), ("忘れました", "LHHHLL")]),
    ("荷物が重いです。", [("荷物が", "HLLL"), ("重いです", "LHHHL")]),
    ("鍵をなくしました。", [("鍵を", "LHL"), ("なくしました", "LHHHLL")]),
    ("掃除をします。", [("掃除を", "LHHH"), ("します", "LHL")]),
    ("洗濯をしました。", [("洗濯を", "LHHHH"), ("しました", "LHLL")]),
    ("料理が上手です。", [("料理が", "HLLL"), ("上手です", "LHHLL")]),
    ("買い物に行きます。", [("買い物に", "LHHHH"), ("行きます", "LHHL")]),
    ("散歩が好きです。", [("散歩が", "LHHH"), ("好きです", "LHLL")]),
    ("ご飯がおいしいです。", [("ご飯が", "HLLL"), ("おいしいです", "LHHLLL")]),
    ("パンを焼きました。", [("パンを", "HLL"), ("焼きました", "LHHLL")]),
    ("卵を買ってください。", [("卵を", "LHLL"), ("買ってください", "LHHHHHL")]),
    ("肉と野菜を食べましょう。", [("肉と", "LHL"), ("野菜を", "LHHH"), ("食べましょう", "LHHHL")]),
    ("お茶を飲みませんか。", [("お茶を", "LHH"), ("飲みませんか", "LHHHLL")]),
    ("酒は飲みません。", [("酒は", "LHH"), ("飲みません", "LHHHL")]),
    ("水がほしいです。", [("水が", "LHH"), ("ほしいです", "LHLLL")]),
    ("牛乳を買いました。", [("牛乳を", "LHHHH"), ("買いました", "LHHLL")]),
    ("部屋が広いです。", [("部屋が", "LHL"), ("広いです", "LHLLL")]),
    ("窓を開けました。", [("窓を", "HLL"), ("開けました", "LHHLL")]),
    ("机の上に本があります。", [("机の", "LHHH"), ("上に", "LHH"), ("本が", "LHH"), ("あります", "LHHL")]),
    ("椅子に座ってください。", [("椅子に", "LHH"), ("座ってください", "LHHHHHHL")]),
    ("服を買いたいです。", [("服を", "LHL"), ("買いたいです", "LHHLLL")]),
    ("靴が新しいです。", [("靴が", "LHL"), ("新しいです", "LHHHLLL")]),
    ("帽子をかぶりました。", [("帽子を", "LHHH"), ("かぶりました", "LHHHLL")]),
    ("傘を忘れないでください。", [("傘を", "HLL"), ("忘れないでください", "LHHHLLLLLL")]),
    ("家族と旅行します。", [("家族と", "HLLL"), ("旅行します", "LHHHHL")]),
    ("国に帰りたいです。", [("国に", "LHH"), ("帰りたいです", "LHHHLLL")]),
    ("世界は広いです。", [("世界は", "HLLL"), ("広いです", "LHLLL")]),
    ("地図を見ています。", [("地図を", "HLL"), ("見ています", "LHHHL")]),
    ("病気が治りました。", [("病気が", "LHHH"), ("治りました", "LHHHLL")]),
    ("仕事が終わりました。", [("仕事が", "LHHH"), ("終わりました", "LHHHLL")]),
    ("電話をかけました。", [("電話を", "LHHH"), ("かけました", "LHHLL")]),
    ("名前を書いてください。", [("名前を", "LHHH"), ("書いてください", "HLLLLLL")]),
    # --- known-hard: verb te-form / plain-past accent shifts the fallback
    # simplifies (the kernel moves leftward in taꜜbete, kaꜜita, yoꜜnda) ---
    ("これを食べて。", [("これを", "LHH"), ("食べて", "HLL")]),
    ("手紙を書いた。", [("手紙を", "LHHH"), ("書いた", "HLL")]),
    ("その本は読んだ。", [("その", "LH"), ("本は", "HLL"), ("読んだ", "HLL")]),
    ("早く起きて。", [("早く", "HLL"), ("起きて", "HLL")]),
]


def _phrases(sentence: str):
    norm = text_normalize(sentence)
    out = []
    for ph in jf.group_phrases(jf.segment(norm)):
        surf = "".join(x[0] for x in ph)
        if surf in ".,!?'-":
            continue
        pit = jf.phrase_pitches(ph)
        out.append((surf, "".join("HL"[1 - p] for p in pit)))
    return out


def _evaluate():
    total = hits = 0
    misses = []
    for sentence, expected in SENTENCES:
        got = dict(_phrases(sentence))
        for surf, want in expected:
            total += 1
            if got.get(surf) == want:
                hits += 1
            else:
                misses.append((sentence, surf, want, got.get(surf)))
    return hits, total, misses


def test_sentence_accent_accuracy_above_85pct():
    hits, total, misses = _evaluate()
    acc = hits / total
    detail = "\n".join(
        f"  {sent} :: {surf}: want {want}, got {got}"
        for sent, surf, want, got in misses[:40]
    )
    print(f"\nJA sentence accent eval: {hits}/{total} phrases = {acc:.1%}")
    assert total >= 200, total  # ~100 sentences, 2-4 phrases each
    assert acc >= 0.85, f"phrase accent accuracy {acc:.1%}\n{detail}"


def test_particles_continue_heiban_high():
    """水が must be LHH (particle rides the plateau), not LHL."""
    assert _phrases("水が")[0] == ("水が", "LHH")


def test_accented_head_suppresses_copula_kernel():
    """高いです keeps the stem kernel: LHLLL, not LHLHL."""
    assert _phrases("高いです")[0] == ("高いです", "LHLLL")


def test_polite_ending_overrides_stem_kernel():
    """食べます: ませ kernel wins over 食べ's: LHHL."""
    assert _phrases("食べます")[0] == ("食べます", "LHHL")
