"""Deterministic tag-stream semantics of the TableFormer autoregressive
decoder, ported as pure functions (no torch).

The reference decode loop
(/root/reference/docling_ibm_models/tableformer/models/table04_rs/
tablemodel04_rs.py:167-319) interleaves three *deterministic* behaviours
with the neural forward passes:

1. in-loop STRUCTURE ERROR CORRECTION of the proposed tag
   (:199-207): first-line ``xcel``→``lcel`` and ``ucel``-then-``lcel``→
   ``fcel``. Quirk preserved: ``line_num`` is initialised to 0 and NEVER
   incremented (:170 is its only assignment), so the "first line"
   correction in fact applies to the whole stream — ``xcel`` can never
   survive into the output.
2. BBOX-SLOT EMISSION tracking (:224-258): which decoded steps get a bbox
   from the bbox decoder (``skip_next_tag`` / ``first_lcel`` bookkeeping;
   ``nl`` and ``ucel`` DO emit slots, the first decoded tag never does
   because ``skip_next_tag`` starts True).
3. the horizontal-SPAN MERGE registry (:237-258 populate, :287-319 apply,
   ``mergebboxes`` :97-108): an ``lcel`` run emits one slot at its start
   and records start→end in ``bboxes_to_merge``; after bbox decoding the
   start/end boxes are merged. Quirk preserved: a span that never closes
   keeps end index ``-1``, so it merges with the LAST decoded bbox
   (python negative indexing), and ``-1`` in ``boxes_to_skip`` skips
   nothing.

These decide *which cells get bboxes* for any tag stream; every real table
hits this code. ``decode_postfix`` replays 1+2+3's bookkeeping over a
proposed tag stream (what the argmax would emit at each step);
``merge_spans`` applies the registry to the decoded (class, coord) lists.
Parity is asserted against the imported reference loop itself in
tests/test_decoder_semantics_parity.py (fake-torch executes the real
predict()).
"""

from __future__ import annotations

from dataclasses import dataclass

# tags that emit a bbox slot when not suppressed (:225-233)
_EMIT_TAGS = ("fcel", "ecel", "ched", "rhed", "srow", "nl", "ucel")
# tags that suppress the NEXT tag's bbox slot (:260-263)
_SKIP_NEXT_TAGS = ("nl", "ucel", "xcel")


@dataclass
class DecodeResult:
    tags: list  # corrected output tags (incl. "<end>" if reached)
    slot_steps: list  # output-tag index of each emitted bbox slot, in order
    bboxes_to_merge: dict  # span start slot -> end slot (or -1, see quirk)

    @property
    def n_slots(self) -> int:
        return len(self.slot_steps)


def decode_postfix(proposed_tags, max_pred_len: int = 512) -> DecodeResult:
    """Replay the decode loop's deterministic bookkeeping over
    ``proposed_tags`` (tag names, the per-step argmax proposals). Stops at
    ``<end>`` or after ``max_pred_len`` output tags, like the reference."""
    output: list = []
    slot_steps: list = []
    bboxes_to_merge: dict = {}
    skip_next_tag = True  # first decoded tag never emits a slot
    prev_tag_ucel = False
    first_lcel = True
    cur_bbox_ind = -1
    bbox_ind = 0

    for tag in proposed_tags:
        if len(output) >= max_pred_len:
            break
        # structure error correction (line_num==0 always — see module doc)
        if tag == "xcel":
            tag = "lcel"
        if prev_tag_ucel and tag == "lcel":
            tag = "fcel"

        if tag == "<end>":
            output.append(tag)
            break
        output.append(tag)

        if not skip_next_tag and tag in _EMIT_TAGS:
            slot_steps.append(len(output) - 1)
            if not first_lcel:
                # close the open horizontal span at this slot
                bboxes_to_merge[cur_bbox_ind] = bbox_ind
            bbox_ind += 1

        if tag != "lcel":
            first_lcel = True
        elif first_lcel:
            # span start emits its own slot immediately
            slot_steps.append(len(output) - 1)
            first_lcel = False
            cur_bbox_ind = bbox_ind
            bboxes_to_merge[cur_bbox_ind] = -1
            bbox_ind += 1

        skip_next_tag = tag in _SKIP_NEXT_TAGS
        prev_tag_ucel = tag == "ucel"

    return DecodeResult(output, slot_steps, bboxes_to_merge)


def merge_bboxes(bbox1, bbox2):
    """cxcywh merge of a span's first and last boxes (reference
    ``mergebboxes`` :97-108). Quirk preserved: ``new_h`` spans from bbox1's
    top to bbox2's bottom but ``new_cy`` is anchored at min(top1, top2), so
    the merged box is NOT the tight union when bbox2 sits higher."""
    new_w = (bbox2[0] + bbox2[2] / 2) - (bbox1[0] - bbox1[2] / 2)
    new_h = (bbox2[1] + bbox2[3] / 2) - (bbox1[1] - bbox1[3] / 2)
    new_left = bbox1[0] - bbox1[2] / 2
    new_top = min(bbox2[1] - bbox2[3] / 2, bbox1[1] - bbox1[3] / 2)
    return [new_left + new_w / 2, new_top + new_h / 2, new_w, new_h]


def box_cxcywh_to_xyxy(b):
    """Reference utils.box_cxcywh_to_xyxy (utils.py:207-211), scalar form."""
    cx, cy, w, h = b
    return [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h]


def merge_spans(classes, coords, bboxes_to_merge):
    """Apply the span-merge registry to decoded per-slot (class, coord)
    lists (reference :287-319). Returns (classes', coords')."""
    out_cls: list = []
    out_coord: list = []
    boxes_to_skip: list = []
    for i in range(len(coords)):
        if i in bboxes_to_merge:
            j = bboxes_to_merge[i]
            boxes_to_skip.append(j)
            out_coord.append(merge_bboxes(coords[i], coords[j]))
            out_cls.append(classes[i])
        elif i not in boxes_to_skip:
            out_coord.append(list(coords[i]))
            out_cls.append(classes[i])
    return out_cls, out_coord
