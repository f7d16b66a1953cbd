"""GPT-4o-class automatic annotation of predictions (offline tooling, L7).

Capability parity with reference gpt_annotation.py: each (image, predicted
noun) pair is judged by a vision LLM into one of the categories
correct_primary / correct_secondary / close_primary / close_secondary /
incorrect, with stateful multi-opinion voting: at least MIN_OPINIONS (3)
opinions are gathered, more (up to MAX_OPINIONS=5) if the vote confidence is
below CONFIDENCE (0.78). Supports a live API driver and an OpenAI Batch API
driver (JSONL request construction + resumable state file); the pure voting /
batching logic is importable and tested without the openai package.

Output annotation schema (ref train.py:4197-4230): {sample: {category: [nouns]}}.
"""

from __future__ import annotations

import base64
import collections
import dataclasses
import json
import os
import time
from typing import Optional, Sequence

from novic_tpu.utils.logger import log

CATEGORIES = ("correct_primary", "correct_secondary", "close_primary",
              "close_secondary", "incorrect")
MIN_OPINIONS = 3
MAX_OPINIONS = 5
CONFIDENCE = 0.78

ANNOTATION_PROMPT = (
    "You are verifying open-vocabulary image classifications. Given the image and the "
    "candidate label '{noun}', answer with exactly one of: correct_primary (label names "
    "the main subject precisely), correct_secondary (correct but for a secondary object), "
    "close_primary (near-miss for the main subject), close_secondary (near-miss for a "
    "secondary object), incorrect.")


@dataclasses.dataclass
class OpinionState:
    """Voting state for one (sample, noun) pair (ref gpt_annotation.py voting)."""

    opinions: list[str] = dataclasses.field(default_factory=list)

    def add(self, category: str):
        if category not in CATEGORIES:
            raise ValueError(f"Invalid category: {category}")
        self.opinions.append(category)

    @property
    def votes(self) -> collections.Counter:
        return collections.Counter(self.opinions)

    @property
    def leader(self) -> Optional[str]:
        votes = self.votes
        return votes.most_common(1)[0][0] if votes else None

    @property
    def confidence(self) -> float:
        if not self.opinions:
            return 0.0
        return self.votes.most_common(1)[0][1] / len(self.opinions)

    @property
    def decided(self) -> bool:
        """Need ≥ MIN_OPINIONS; gather more (to MAX_OPINIONS) while confidence
        is below the threshold."""
        n = len(self.opinions)
        if n < MIN_OPINIONS:
            return False
        if n >= MAX_OPINIONS:
            return True
        return self.confidence >= CONFIDENCE

    @property
    def needs_opinion(self) -> bool:
        return not self.decided


def build_batch_requests(pairs: Sequence[tuple[str, str]], model: str = "gpt-4o",
                         detail: str = "low") -> list[dict]:
    """(image_path, noun) pairs → OpenAI Batch API JSONL request objects
    (ref gpt_annotation.py batch driver)."""
    requests = []
    for i, (image_path, noun) in enumerate(pairs):
        requests.append({
            "custom_id": f"{os.path.basename(image_path)}::{noun}::{i}",
            "method": "POST",
            "url": "/v1/chat/completions",
            "body": {
                "model": model,
                "max_tokens": 8,
                "messages": [{
                    "role": "user",
                    "content": [
                        {"type": "text", "text": ANNOTATION_PROMPT.format(noun=noun)},
                        {"type": "image_url",
                         "image_url": {"url": f"file://{image_path}", "detail": detail}},
                    ],
                }],
            },
        })
    return requests


def parse_category(response_text: str) -> Optional[str]:
    text = response_text.strip().lower()
    for category in CATEGORIES:
        if category in text:
            return category
    return None


def finalize_annotations(states: dict[tuple[str, str], OpinionState]) -> dict[str, dict[str, list[str]]]:
    """Voting states → annotation JSON schema {sample: {category: [nouns]}}."""
    out: dict[str, dict[str, list[str]]] = {}
    for (sample, noun), state in states.items():
        leader = state.leader
        if leader is None:
            continue
        out.setdefault(sample, {}).setdefault(leader, []).append(noun)
    return out


class AnnotationDriver:
    """Live-API annotation with resumable state (requires openai + key)."""

    def __init__(self, state_path: str, model: str = "gpt-4o"):
        self.state_path = state_path
        self.model = model
        self.states: dict[tuple[str, str], OpinionState] = {}
        if os.path.exists(state_path):
            with open(state_path) as f:
                raw = json.load(f)
            for key, opinions in raw.items():
                sample, noun = key.split("::", 1)
                self.states[(sample, noun)] = OpinionState(opinions=list(opinions))
            log.info(f"Resumed annotation state with {len(self.states)} pairs")

    def save(self):
        raw = {f"{s}::{n}": st.opinions for (s, n), st in self.states.items()}
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(raw, f)
        os.replace(tmp, self.state_path)

    def annotate(self, pairs: Sequence[tuple[str, str]], sleep: float = 0.2):
        try:
            import openai
        except ImportError:
            raise RuntimeError("gpt annotation requires the openai package "
                               "(offline tooling; not available in this environment)")
        client = openai.OpenAI()
        backoff = 1.0
        for image_path, noun in pairs:
            key = (os.path.basename(image_path), noun)
            state = self.states.setdefault(key, OpinionState())
            while state.needs_opinion:
                try:
                    with open(image_path, "rb") as f:
                        b64 = base64.b64encode(f.read()).decode()
                    resp = client.chat.completions.create(
                        model=self.model, max_tokens=8,
                        messages=[{"role": "user", "content": [
                            {"type": "text", "text": ANNOTATION_PROMPT.format(noun=noun)},
                            {"type": "image_url",
                             "image_url": {"url": f"data:image/jpeg;base64,{b64}",
                                           "detail": "low"}}]}])
                    category = parse_category(resp.choices[0].message.content)
                    if category:
                        state.add(category)
                    backoff = 1.0
                    time.sleep(sleep)
                except Exception as e:  # noqa: BLE001 — exponential backoff on API errors
                    log.warning(f"Annotation API error: {e}")
                    time.sleep(backoff)
                    backoff = min(backoff * 2, 600)
            self.save()

    def export(self, out_path: str):
        """action_save_classes equivalent: write the final annotation JSON."""
        annotations = finalize_annotations(self.states)
        with open(out_path, "w") as f:
            json.dump(annotations, f, indent=2, sort_keys=True)
        log.info(f"Wrote {sum(len(v) for v in annotations.values())} annotations: {out_path}")


def estimate_batch_cost(num_pairs: int, opinions: int = MIN_OPINIONS,
                        tokens_per_request: int = 1100,
                        usd_per_mtoken: float = 2.5) -> float:
    """Rough cost estimate for a batch run (ref gpt_annotation.py cost estimation)."""
    return num_pairs * opinions * tokens_per_request * usd_per_mtoken / 1e6


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="GPT auto-annotation of predictions")
    p.add_argument("--predictions", required=True, help="predictions.json from action=infer")
    p.add_argument("--state", required=True, help="resumable opinion state JSON")
    p.add_argument("--out", required=True, help="output annotation JSON")
    p.add_argument("--model", default="gpt-4o")
    a = p.parse_args()
    with open(a.predictions) as f:
        preds = json.load(f)
    pairs = []
    for model_out in preds["models"].values():
        for gout in model_out["gencfgs"].values():
            for key, top in zip(preds["keys"], gout["pred"]):
                pairs.append((key, top[0]))
    driver = AnnotationDriver(a.state, model=a.model)
    driver.annotate(pairs)
    driver.export(a.out)
