"""Official-style VQA accuracy with answer normalization.

Re-implements the scoring rules of the official OK-VQA evaluator the
reference vendors (`src/utils/vqaEval.py`, 324 LoC): per-answer accuracy is
``min(1, #matching human answers / 3)``, averaged over the 10 leave-one-out
subsets of the 10 human answers; answers are normalized (articles dropped,
punctuation stripped, digits worded→numeric, contractions expanded).
"""

from __future__ import annotations

import re
from typing import Dict, List

CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hes": "he's", "howd": "how'd", "howll": "how'll",
    "hows": "how's", "im": "i'm", "ive": "i've", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's", "maam": "ma'am",
    "mightve": "might've", "mustve": "must've", "shant": "shan't",
    "shed": "she'd", "shes": "she's", "shouldve": "should've",
    "shouldnt": "shouldn't", "thats": "that's", "theres": "there's",
    "theyd": "they'd", "theyll": "they'll", "theyre": "they're",
    "theyve": "they've", "wasnt": "wasn't", "wed": "we'd", "weve": "we've",
    "werent": "weren't", "whatll": "what'll", "whats": "what's",
    "whered": "where'd", "wheres": "where's", "whod": "who'd",
    "wholl": "who'll", "whos": "who's", "whove": "who've", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't", "yall": "y'all",
    "youd": "you'd", "youll": "you'll", "youre": "you're", "youve": "you've",
}
MANUAL_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
ARTICLES = {"a", "an", "the"}
PUNCT = r"[;/\[\]\"{}()=+\\_\-><@`,?!.]"
COMMA_IN_NUMBER = re.compile(r"(\d),(\d)")
PERIOD = re.compile(r"(?<!\d)\.(?!\d)")


def normalize_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = COMMA_IN_NUMBER.sub(r"\1\2", ans)
    ans = PERIOD.sub("", ans)
    ans = re.sub(PUNCT, " ", ans)
    words = []
    for w in ans.split():
        w = MANUAL_MAP.get(w, w)
        if w in ARTICLES:
            continue
        w = CONTRACTIONS.get(w, w)
        words.append(w)
    return " ".join(words)


def vqa_accuracy(prediction: str, human_answers: List[str]) -> float:
    """Official accuracy: average over leave-one-out splits of
    min(1, matches/3)."""
    pred = normalize_answer(prediction)
    gts = [normalize_answer(a) for a in human_answers]
    if not gts:
        return 0.0
    accs = []
    for i in range(len(gts)):
        others = gts[:i] + gts[i + 1:]
        matches = sum(1 for g in others if g == pred)
        accs.append(min(1.0, matches / 3.0))
    return float(sum(accs) / len(accs))


def okvqa_scores(predictions: List[str], answer_lists: List[List[str]]) -> Dict[str, float]:
    accs = [vqa_accuracy(p, a) for p, a in zip(predictions, answer_lists)]
    return {
        "accuracy_overall": float(sum(accs) / max(len(accs), 1)) * 100.0,
    }
