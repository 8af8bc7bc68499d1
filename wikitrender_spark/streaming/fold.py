"""Incremental event fold — the single source of truth for event-at-a-time
semantics (reference: updateFromRCStream + log routing,
/root/reference/index.js:174-273,320-342).

Both the batch replay (operators/lifecycle.replay_lifecycle) and the
streaming stateful processor (streaming/processor.py) fold events through
THIS module, so batch-stream equivalence is by construction: the streaming
run differs only in that the fold is split across micro-batches with the
titles map carried in the state store between them.

State model: ``titles`` — dict id -> page dict, the Spark-side twin of
WikiSocketCollection.titles (/root/reference/index.js:115). Page dicts hold
sets/dicts for contributor tracking; (de)serialization to a JSON state-store
blob is in serialize_titles/deserialize_titles.

Also implements the purge policy P2 (cleaner, /root/reference/index.js:
362-398) against an injected ``now`` — one logical clock per micro-batch
(semantic pin, SURVEY.md §2.9-1).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Iterable

import pandas as pd

from ..functions import classify

_IP_RE = re.compile(classify.IP_REGEX)
_DEL_RE = re.compile(classify.DELETE_TARGET_REGEX)

#: page-state row columns emitted by the fold (scalar form).
STATE_COLUMNS = [
    "id", "wiki", "title", "edits", "anonEdits", "isNew", "notabilityFlags",
    "volatileFlags", "reverts", "start", "updated", "bytesChanged",
    "n_contributors", "n_anons", "max_user_edits", "total_user_edits",
    "isProtected",
]

STATE_SCHEMA = (
    "id string, wiki string, title string, edits long, anonEdits long, "
    "isNew boolean, notabilityFlags long, volatileFlags long, reverts long, "
    "start timestamp, updated timestamp, bytesChanged long, "
    "n_contributors long, n_anons long, max_user_edits long, "
    "total_user_edits long, isProtected boolean"
)


def norm_wiki(wiki: str) -> str:
    """'enwiki' -> '' (/root/reference/index.js:438-440)."""
    return "" if wiki == "enwiki" else wiki


def page_id(wiki: str, title: str) -> str:
    """A1 key derivation (/root/reference/index.js:436-446), normalized-id
    pin for protect (SURVEY.md §2.9)."""
    w = norm_wiki(wiki)
    return f"{w}/{title}" if w else title


def fresh_page(pid: str, wiki: str, title: str, now) -> dict:
    """Empty WikiPage (/root/reference/index.js:16-35)."""
    return dict(
        id=pid, wiki=norm_wiki(wiki), title=title, edits=0, anonEdits=0,
        isNew=False, notabilityFlags=0, volatileFlags=0, reverts=0,
        start=now, updated=now, distribution={}, anon_set=set(),
        contrib_set=set(), bytesChanged=0, isProtected=False, safe=False,
    )


def fold_pdf(titles: dict, pdf: pd.DataFrame,
             changed: set | None = None, removed: set | None = None) -> None:
    """Fold one (ts, seq)-sorted slice of rc events into ``titles`` in
    place, recording ids touched (``changed``) and ids whose state row was
    dropped or re-keyed away (``removed``).

    Row routing mirrors /root/reference/index.js:320-342:
    - log_type == 'log'      -> move / protect / delete  (A4-A6)
    - log_type == 'control'  -> markSafe / markUnsafe    (A7, control
      stream unioned into the keyed processor per SURVEY.md §2.3-A7;
      applies only to live pages, /root/reference/index.js:409-411)
    - otherwise              -> edit accumulation        (A2-A3)
    """
    if changed is None:
        changed = set()
    if removed is None:
        removed = set()

    def get_page(wiki, title, now):
        pid = page_id(wiki, title)
        if pid not in titles:
            titles[pid] = fresh_page(pid, wiki, title, now)
        return titles[pid]

    for row in pdf.sort_values(["ts", "seq"]).itertuples(index=False):
        now = row.ts
        if row.log_type is not None and not pd.isna(row.log_type):
            if row.log_type == "control":
                pid = page_id(row.wiki, row.title)
                if row.log_action == "drop":
                    # drop() removes by id (/root/reference/index.js:427-430)
                    if pid in titles:
                        del titles[pid]
                        removed.add(pid)
                elif pid in titles:
                    titles[pid]["safe"] = row.log_action == "markSafe"
                    changed.add(pid)
            elif row.log_action == "move":
                # renamePage (/root/reference/index.js:154-167): the source
                # page adopts the target id/title, OVERWRITING any fresh
                # state at the target (old+new are not merged).
                src_existed = page_id(row.wiki, row.title) in titles
                page = get_page(row.wiki, row.title, now)
                new_page = get_page(row.wiki, row.log_target, now)
                del titles[page["id"]]
                if src_existed:
                    # a never-live source must not emit a tombstone for an
                    # id consumers never saw as live
                    removed.add(page["id"])
                page["id"] = new_page["id"]
                page["title"] = new_page["title"]
                page["updated"] = now
                titles[page["id"]] = page
                changed.add(page["id"])
            elif row.log_action == "protect":
                # protectPage (/root/reference/index.js:417-422), id pin.
                pid = page_id(row.wiki, row.title)
                if pid in titles:
                    titles[pid]["isProtected"] = True
                    changed.add(pid)
            elif row.log_action == "delete":
                # F11 + drop (/root/reference/index.js:328-337,427-430).
                m = _DEL_RE.search(row.log_action_comment or "")
                target = (m.group(1) or m.group(2)) if m else None
                if target:
                    pid = page_id(row.wiki, target)
                    if titles.pop(pid, None) is not None:
                        removed.add(pid)
            continue

        # edit branch: updateFromRCStream (/root/reference/index.js:174-273)
        page = get_page(row.wiki, row.title, now)
        comment = (row.comment or "").lower()
        is_bot = bool(row.bot) or row.user in classify.KNOWN_BOTS
        is_revert = any(k in comment for k in classify.REVERT_KEYWORDS)
        delta = int(row.length_new - row.length_old)
        if row.type == "new":
            page["isNew"] = True
        if is_revert:
            page["reverts"] += 1
            page["bytesChanged"] += delta
        elif not is_bot:
            page["edits"] += 1
            page["bytesChanged"] += delta
        if any(k in comment for k in classify.NOTABILITY_KEYWORDS):
            page["notabilityFlags"] += 1
        if any(k in comment for k in classify.VOLATILE_KEYWORDS):
            page["volatileFlags"] += 1
        if not is_bot and not is_revert:
            if _IP_RE.search(row.user):
                page["anonEdits"] += 1
                page["anon_set"].add(row.user)
            else:
                page["contrib_set"].add(row.user)
            page["distribution"][row.user] = (
                page["distribution"].get(row.user, 0) + 1
            )
        page["updated"] = now
        changed.add(page["id"])


# ---------------------------------------------------------------------------
# purge policy P2 (/root/reference/index.js:362-398)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PurgeParams:
    """Cleaner thresholds (defaults /root/reference/index.js:110-113)."""
    max_lifespan: float = 1440.0     # minutes; evicts even safe pages
    max_inactivity: float = 60.0     # minutes since last update
    min_speed: float = 3.0           # edits/minute floor
    min_purge_time: float = 5.0      # grace age before any purge


def edits_per_minute(page: dict, age_min: float) -> float:
    """D3 (/root/reference/index.js:80-88): raw count when age < 1 or
    count == 0 (anti-div-by-small clamp), else count/age. The cleaner calls
    it with defaults: no reverts, no anons."""
    count = page["edits"]
    if age_min < 1 or count == 0:
        return float(count)
    return count / age_min


def purge_titles(titles: dict, now, params: PurgeParams) -> set:
    """Apply P2 at one logical ``now``; returns evicted ids. Pages older
    than min_purge_time are evicted when not safe and (too slow OR
    inactive); max_lifespan evicts regardless of safe."""
    evicted = set()
    for pid, page in list(titles.items()):
        age = (now - page["start"]).total_seconds() / 60.0
        if age <= params.min_purge_time:
            continue
        last_upd = (now - page["updated"]).total_seconds() / 60.0
        drop = False
        if not page["safe"] and (
            edits_per_minute(page, age) < params.min_speed
            or last_upd > params.max_inactivity
        ):
            drop = True
        if age > params.max_lifespan:
            drop = True
        if drop:
            del titles[pid]
            evicted.add(pid)
    return evicted


# ---------------------------------------------------------------------------
# output + state-store (de)serialization
# ---------------------------------------------------------------------------

def page_record(p: dict) -> dict:
    """Scalar output row for one page (STATE_COLUMNS order)."""
    dist = p["distribution"]
    return dict(
        id=p["id"], wiki=p["wiki"], title=p["title"], edits=p["edits"],
        anonEdits=p["anonEdits"], isNew=p["isNew"],
        notabilityFlags=p["notabilityFlags"],
        volatileFlags=p["volatileFlags"], reverts=p["reverts"],
        start=p["start"], updated=p["updated"],
        bytesChanged=p["bytesChanged"],
        n_contributors=len(p["contrib_set"]), n_anons=len(p["anon_set"]),
        max_user_edits=max(dist.values()) if dist else None,
        total_user_edits=sum(dist.values()) if dist else None,
        isProtected=p["isProtected"],
    )


def titles_to_pdf(titles: dict, ids: Iterable[str] | None = None) -> pd.DataFrame:
    rows = [page_record(p) for pid, p in titles.items()
            if ids is None or pid in ids]
    return pd.DataFrame(rows, columns=STATE_COLUMNS)


def _ts_us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def serialize_titles(titles: dict) -> str:
    """titles map -> JSON state blob (sets -> lists, timestamps -> unix
    micros). The state store persists this per group key — the incremental,
    fault-tolerant analogue of the reference's whole-map LevelDB blob
    (/root/reference/index.js:395-397)."""
    out = {}
    for pid, p in titles.items():
        q = dict(p)
        q["start"] = _ts_us(p["start"])
        q["updated"] = _ts_us(p["updated"])
        q["anon_set"] = sorted(p["anon_set"])
        q["contrib_set"] = sorted(p["contrib_set"])
        out[pid] = q
    return json.dumps(out)


def deserialize_titles(blob: str | None) -> dict:
    """JSON state blob -> titles map (bootstrap twin of
    /root/reference/index.js:118-141)."""
    if not blob:
        return {}
    titles = {}
    for pid, q in json.loads(blob).items():
        q["start"] = pd.to_datetime(q["start"], unit="us")
        q["updated"] = pd.to_datetime(q["updated"], unit="us")
        q["anon_set"] = set(q["anon_set"])
        q["contrib_set"] = set(q["contrib_set"])
        titles[pid] = q
    return titles
