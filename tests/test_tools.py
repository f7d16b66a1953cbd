"""Offline tooling tests: caption templatization, captions validation,
annotation voting/batching, annotation GUI state machine, specificity scoring."""

import json

import pytest

from novic_tpu.tools.annotate_gui import AnnotationSession
from novic_tpu.tools.caption_check import check_captions
from novic_tpu.tools.caption_generation import (
    caption_quota,
    extract_templates,
    noun_complete,
    prepare_state,
    templatize_caption,
)
from novic_tpu.tools.gpt_annotation import (
    CATEGORIES,
    OpinionState,
    build_batch_requests,
    estimate_batch_cost,
    finalize_annotations,
    parse_category,
)
from novic_tpu.tools.specificity import specificity_score


def test_templatize_caption():
    assert templatize_caption("A dog runs in the park", ["dog"], "singular") == \
        "A {singular} runs in the park"
    assert templatize_caption("The dog's toy is red", ["dog"], "singular") == \
        "The {singular}'s toy is red"
    # Trailing punctuation stripped (the captions cache writer re-appends '.')
    assert templatize_caption("I saw a dog.", ["dog"], "singular") == "I saw a {singular}"
    assert templatize_caption("I love my dog,", ["dog"], "singular") == "I love my {singular}"
    # No match
    assert templatize_caption("A cat sits", ["dog"], "singular") is None
    # Case insensitive, word boundary (no match inside 'dogma')
    assert templatize_caption("Dogma is not an animal", ["dog"], "singular") is None
    assert templatize_caption("DOG in snow", ["dog"], "singular") == "{singular} in snow"


def test_caption_quota_and_state():
    assert caption_quota(3) == 30
    assert caption_quota(50) == 100  # capped at 10
    state = prepare_state([{"id": 0, "target_noun": "dog", "pretty_noun": "Dog",
                            "singulars": ["dog"], "plurals": ["dogs"],
                            "singulars_freq": [2], "plurals_freq": [1]}],
                          captions_per_freq=2)
    e = state[0]
    assert e["num_singular_captions"] == 4 and e["num_plural_captions"] == 2
    assert not noun_complete(e)
    added, dups = extract_templates(e, ["A dog runs", "Two dogs play", "A dog runs",
                                        "cat here"])
    assert added == 2 and dups == 1
    assert e["singular_captions"] == ["A {singular} runs"]
    assert e["plural_captions"] == ["Two {plural} play"]


def test_check_captions():
    good = [{"target_noun": "dog",
             "singular_captions": ["A {singular} runs."],
             "plural_captions": ["Two {plural} play."]}]
    assert check_captions(good)["issues"] == []
    bad = [{"target_noun": "dog",
            "singular_captions": ["no placeholder", "A {singular} and {plural}.",
                                  "dup {singular}", "dup {singular}", "bad  space {singular}"],
            "plural_captions": ["ends with comma {plural},", "ünïcode {plural}"]}]
    issues = check_captions(bad)["issues"]
    assert len(issues) >= 5


def test_opinion_voting():
    s = OpinionState()
    assert s.needs_opinion
    s.add("correct_primary")
    s.add("correct_primary")
    assert s.needs_opinion  # < MIN_OPINIONS
    s.add("correct_primary")
    assert s.decided and s.leader == "correct_primary" and s.confidence == 1.0
    # Split vote: below confidence → more opinions up to MAX
    s2 = OpinionState(opinions=["correct_primary", "incorrect", "close_primary"])
    assert s2.needs_opinion  # confidence 1/3 < 0.78
    s2.add("incorrect")
    assert s2.needs_opinion  # 2/4 = 0.5
    s2.add("incorrect")
    assert s2.decided  # hit MAX_OPINIONS
    assert s2.leader == "incorrect"
    with pytest.raises(ValueError):
        s2.add("bogus")


def test_finalize_and_batch():
    states = {("img1.jpg", "dog"): OpinionState(opinions=["correct_primary"] * 3),
              ("img1.jpg", "cat"): OpinionState(opinions=["incorrect"] * 3),
              ("img2.jpg", "tree"): OpinionState(opinions=["close_primary"] * 3)}
    ann = finalize_annotations(states)
    assert ann["img1.jpg"]["correct_primary"] == ["dog"]
    assert ann["img1.jpg"]["incorrect"] == ["cat"]
    assert ann["img2.jpg"]["close_primary"] == ["tree"]

    reqs = build_batch_requests([("/x/img1.jpg", "dog")])
    assert reqs[0]["custom_id"].startswith("img1.jpg::dog")
    assert "dog" in reqs[0]["body"]["messages"][0]["content"][0]["text"]
    assert estimate_batch_cost(1000) > 0
    assert parse_category(" Correct_Primary\n") == "correct_primary"
    assert parse_category("definitely incorrect") == "incorrect"
    assert parse_category("no idea") is None


def test_annotation_session(tmp_path):
    pairs = [("/a/img1.jpg", "dog"), ("/a/img2.jpg", "cat"), ("/a/img3.jpg", "tree")]
    s = AnnotationSession(pairs)
    assert s.apply_key("q")  # img1 correct_primary
    assert s.apply_key("i")  # img2 incorrect
    assert s.current == ("/a/img3.jpg", "tree")
    assert s.apply_key("u")  # undo img2
    assert s.current == ("/a/img2.jpg", "cat")
    assert s.apply_key("p")  # close_secondary
    assert s.apply_key("s")  # skip img3
    assert s.done
    assert s.annotations == {"img1.jpg": {"correct_primary": ["dog"]},
                             "img2.jpg": {"close_secondary": ["cat"]}}
    path = str(tmp_path / "ann.json")
    s.save(path)
    # Resume skips annotated pairs
    with open(path) as f:
        s2 = AnnotationSession(pairs, json.load(f))
    assert s2.current == ("/a/img3.jpg", "tree")
    # Invalid key ignored
    assert not s2.apply_key("z")


def test_specificity_score():
    preds = {"keys": ["/d/img1.jpg", "/d/img2.jpg"],
             "models": {"m": {"gencfgs": {"g": {"pred": [["dog"], ["cat"]],
                                                "score": [[0.0], [0.0]],
                                                "result": [["invalid"], ["invalid"]]}}}}}
    anns = {"img1.jpg": {"correct_primary": ["dog"]},
            "img2.jpg": {"close_primary": ["cat"]}}
    spec = {"dog": 0.9, "cat": 1.0}
    scores = specificity_score(preds, anns, spec)
    assert abs(scores[("m", "g")] - (1.0 * 0.9 + 0.5 * 1.0) / 2) < 1e-9


def test_specificity_shipped_asset():
    """The released specificity annotations ship with the repo (reference
    extras/specificity/_specificity_annotations.json) and work end-to-end."""
    from novic_tpu.tools.specificity import default_specificity_path
    with open(default_specificity_path()) as f:
        spec = json.load(f)
    assert len(spec) > 5000
    assert spec[""] == 0.5  # fallback row for empty predictions
    assert all(isinstance(k, str) and v in (0.5, 1) for k, v in spec.items())
    # Spot-check released factors and run them through the scorer
    assert spec["shrub"] == 0.5 and spec["flagship"] == 1
    preds = {"keys": ["/d/a.jpg"],
             "models": {"m": {"gencfgs": {"g": {"pred": [["shrub"]],
                                                "score": [[0.0]],
                                                "result": [["valid"]]}}}}}
    anns = {"a.jpg": {"correct_primary": ["shrub"]}}
    scores = specificity_score(preds, anns, spec)
    assert abs(scores[("m", "g")] - 1.0 * 0.5) < 1e-9


class _FakeRemote:
    """Offline OpenAI Batch API double: files + batches with a controllable
    completion schedule (completes a batch after `lag` polls)."""

    class _Obj:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    def __init__(self, lag=1, category="correct_primary"):
        self.lag = lag
        self.category = category
        self.files_store = {}
        self.batches_store = {}
        self.deleted = []
        self.n = 0
        outer = self

        class Files:
            def create(self, file, purpose):
                outer.n += 1
                fid = f"file-{outer.n}"
                outer.files_store[fid] = file.read().decode()
                return outer._Obj(id=fid)

            def content(self, file_id):
                return outer._Obj(text=outer.files_store[file_id])

            def delete(self, file_id):
                outer.deleted.append(file_id)
                outer.files_store.pop(file_id, None)

        class Batches:
            def create(self, completion_window, endpoint, input_file_id, metadata):
                outer.n += 1
                bid = f"batch-{outer.n}"
                outer.batches_store[bid] = {"input": input_file_id, "polls": 0}
                return outer._Obj(id=bid)

            def retrieve(self, batch_id):
                b = outer.batches_store[batch_id]
                b["polls"] += 1
                if b["polls"] <= outer.lag:
                    return outer._Obj(id=batch_id, status="in_progress")
                # Produce responses for every request in the input JSONL
                lines = []
                import json as _json

                for line in outer.files_store[b["input"]].splitlines():
                    req = _json.loads(line)
                    lines.append(_json.dumps({
                        "custom_id": req["custom_id"],
                        "response": {"body": {
                            "choices": [{"message": {"content": outer.category}}],
                            "usage": {"prompt_tokens": 100, "completion_tokens": 2,
                                      "total_tokens": 102}}}}))
                outer.n += 1
                out_id = f"file-{outer.n}"
                outer.files_store[out_id] = "\n".join(lines)
                return outer._Obj(id=batch_id, status="completed",
                                  output_file_id=out_id, error_file_id=None)

        self.files = Files()
        self.batches = Batches()


def test_batch_lifecycle_roundtrip(tmp_path):
    """Full offline Batch API round-trip: submit under quotas -> poll ->
    download -> vote -> cleanup -> export (ref gpt_annotation.py:299-960)."""
    from novic_tpu.tools.gpt_annotation import BatchAnnotationDriver

    fake = _FakeRemote(lag=1)
    sleeps = []
    drv = BatchAnnotationDriver(str(tmp_path / "state.json"), client=fake,
                                max_batch_requests=4, max_pending_batches=2,
                                poll_interval=0.0, sleep=sleeps.append)
    pairs = [(f"/x/img{i}.jpg", noun) for i, noun in
             enumerate(["dog", "cat", "apple"])]
    drv.run(pairs)
    # 3 pairs x MIN_OPINIONS(3) = 9 requests at <=4/batch => 3 batches,
    # capped at 2 pending => the quota gate had to block at least once
    assert not drv.pending
    assert drv.usage["requests"] == 9
    ann_path = tmp_path / "ann.json"
    drv.export(str(ann_path))
    import json as _json

    ann = _json.loads(ann_path.read_text())
    assert ann == {"img0.jpg": {"correct_primary": ["dog"]},
                   "img1.jpg": {"correct_primary": ["cat"]},
                   "img2.jpg": {"correct_primary": ["apple"]}}
    # Remote cleanup: every uploaded/output file deleted
    assert not fake.files_store
    # Local cleanup: no leftover JSONLs
    assert not list((tmp_path / "batches").glob("*.jsonl"))


def test_batch_lifecycle_resume(tmp_path):
    """Pending batches persist in the state file and resume across drivers."""
    from novic_tpu.tools.gpt_annotation import BatchAnnotationDriver

    fake = _FakeRemote(lag=100)  # never completes during first driver
    drv = BatchAnnotationDriver(str(tmp_path / "state.json"), client=fake,
                                max_batch_requests=100, poll_interval=0.0,
                                sleep=lambda s: None)
    drv.submit([("/x/a.jpg", "dog")])
    assert len(drv.pending) == 1
    assert drv.poll_once() == 0  # still in progress

    # New driver resumes the pending batch; in-flight requests are NOT re-sent
    fake.lag = 0
    drv2 = BatchAnnotationDriver(str(tmp_path / "state.json"), client=fake,
                                 max_batch_requests=100, poll_interval=0.0,
                                 sleep=lambda s: None)
    assert len(drv2.pending) == 1
    assert drv2.submit([("/x/a.jpg", "dog")]) == 0
    assert drv2.poll_once() == 1
    assert drv2.states[("a.jpg", "dog")].opinions == ["correct_primary"] * 3


def test_backoff_waiter():
    from novic_tpu.tools.gpt_annotation import BackoffWaiter

    waits = []
    w = BackoffWaiter(allowed_failures=2, base_wait=10, max_wait=100,
                      factor=2.0, sleep=waits.append)
    assert w.update(False) == 0.0 and w.update(False) == 0.0  # free failures
    assert w.update(False) == 10.0
    assert w.update(False) == 20.0
    assert w.update(True) == 0.0  # reset
    assert w.update(False) == 0.0
    for _ in range(10):
        w.update(False)
    assert waits[-1] == 100.0  # capped
