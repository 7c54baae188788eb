"""CrawlSpec — the user-extension surface (the reference DSL, re-expressed).

The reference serializes Ruby blocks to source strings and instance_eval's
them on workers (dsl_front_end.rb:135-151, dsl_core.rb:95-119). Ray ships
plain Python callables via cloudpickle, so the spec is a frozen dataclass of
options + hooks, executed at reference-identical points inside the extract
stage (do_page_blocks dsl_core.rb:180-186; links_to_follow dsl_core.rb:193-197).

Option defaults mirror DEFAULT_OPTS (dsl_front_end.rb:32-79).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class CrawlSpec:
    # admission options (dsl_front_end.rb defaults)
    depth_limit: int | None = None            # too_deep? dsl_core.rb:257-263
    obey_robots_txt: bool = False             # allowed() dsl_core.rb:237-241
    inside_domain: bool = True                # in_domain? dsl_core.rb:246-252
    outside_domain: bool = False
    skip_query_strings: bool = False          # dsl_core.rb:269-271
    skip_link_patterns: list[str] = field(default_factory=list)  # path regexes
    keep_redirects: bool = False              # crawl_job.rb:80-84
    discard_page: bool = False                # drop bodies/spans after hooks
    delay: float = 0.0                        # per-host politeness seconds
    redirect_limit: int = 5                   # http.rb:35
    user_agent: str = "cloud-crawler-ray/0.1"  # "random" → seeded UA stream
    ua_seed: int = 1364249661                 # determinism for "random" UAs
    accept_cookies: bool = False              # dsl_front_end.rb:52
    # initial cookies sent with every request (opts[:cookies], http.rb:179;
    # crawl_job_spec.rb:221-224). The jar grows from Set-Cookie responses
    # only when accept_cookies is True; jar updates commit at wave
    # boundaries (like the seen set), so fetch stays deterministic and
    # distribution-safe in both task and actor mode.
    cookies: dict[str, str] | None = None
    headless: bool = False                    # option surface only (http.rb:198-209
    #                                           selenium re-render; no browser in
    #                                           this sandbox — no-op, like the
    #                                           reference's stub browser.rb:33-37)
    follow_links: bool = True                 # False = BatchCurlJob mode
    # Max jobs fetched per wave; the remainder of the planned pool spills to
    # a durable checkpoint partition drained by later waves (the qless
    # job_limit throttle, batch_job.rb:229-241 + dsl_front_end.rb:73-77 —
    # the reference checkpoints overflow and leaves restore TODO; here the
    # spill is merged into the next wave's candidate pool, which provably
    # preserves the uncapped per-URL seq order because candidate priority
    # (parent_seq, ordinal) is monotone across waves).
    job_limit: int | None = None
    # Per-host crawl budget (target-side addition; no reference analog —
    # qless had per-queue throttles, not per-host caps): at most this many
    # pages are ever SCHEDULED per host across the whole crawl. Enforced at
    # wave-plan time after dedup/seen admission, in processing order
    # (priority-first when priority_fn is set), so the budget keeps each
    # host's top-priority jobs. Dropped candidates are not seen-marked and
    # not spilled (a later rediscovery re-competes against the same budget).
    # Counts commit with the wave (mark-after-commit, like the clocks), so
    # resume never over- or under-schedules a host.
    max_pages_per_host: int | None = None
    # Crawl-trap guard (target-side addition; the reference's only trap
    # defenses are depth_limit and skip_links_like): at most this many pages
    # are ever SCHEDULED per (host, URL skeleton), where the skeleton
    # collapses digit runs / long hex runs / query VALUES
    # (canon.url_skeleton) — calendar pagers, session-id mills and facet
    # grids share one skeleton and get capped; legitimately distinct paths
    # do not. Applied after max_pages_per_host in the same processing order,
    # with the same semantics: drops are not seen-marked and not spilled,
    # counts commit with the wave (shared scheduled-count map, \x1f-separated
    # keyspace) and restore on resume.
    trap_guard: int | None = None
    # Per-host parallel connections (the reference's per-host connection
    # pool, http.rb:219-240, made explicit): a host's jobs round-robin over
    # this many lanes; the politeness delay applies PER LANE, every lane
    # starts a wave at the host's committed clock, and the clock commits to
    # the max lane end. 1 = the reference's serial-per-host model.
    host_connections: int = 1
    # Meta-robots compliance (target-side addition; the reference ignores
    # in-page directives): when True, <meta name="robots"> noindex
    # suppresses the page's document (the page is still fetched,
    # seen-marked and recorded in pages with noindex=true), nofollow (or
    # none) suppresses ALL link following from the page, and individual
    # rel="nofollow" anchors are excluded from link following. Hooks still
    # see the full extracted link list.
    obey_meta_robots: bool = False
    # Adaptive politeness (target-side addition; the reference's delay is
    # static): when set, each host's delay becomes
    # max(effective static delay, pct% of the host's committed mean job
    # latency) — a slow origin is backed off proportionally (e.g. 150 =
    # wait 1.5x its observed mean latency between requests). Latency sums
    # commit with the wave (mark-after-commit, like the clocks) and restore
    # on resume, so both planners and a resumed crawl compute identical
    # slots. Integer-exact: (pct * sum_ms) // (100 * n).
    adaptive_delay_pct: int | None = None
    # robots Crawl-delay compliance (target-side addition; the reference
    # obeys robots allow/deny only): when True, each host's politeness
    # delay is max(spec.delay, its robots.txt Crawl-delay for user_agent).
    # Independent of obey_robots_txt; robots fetch costs no clock time
    # (matching the admission-side robots model).
    obey_crawl_delay: bool = False
    # Sitemap seeding (target-side addition): when True, each unique seed
    # host's sitemaps — robots.txt `Sitemap:` directives when present (the
    # sitemaps.org discovery protocol), else /sitemap.xml by convention —
    # expand into seeds after the user seeds, in document order (wave-0
    # dedup keeps the first claimant). <sitemapindex> files recurse
    # breadth-first, capped per host. Applies to list seeds against a
    # materialized web table; Dataset seed frontiers (huge curl lists)
    # skip expansion.
    use_sitemaps: bool = False
    # Optional frontier priority (the north-rule "priority queue" surface):
    # a callable over the candidate row dict {url, referer, depth,
    # parent_seq, ordinal} returning an int; each wave's admitted jobs are
    # ordered by (priority DESC, parent_seq, ordinal) before seq assignment,
    # so higher-priority URLs fetch first — and with job_limit set, the cap
    # keeps the TOP-priority jobs and spills the rest (best-first crawling
    # under a budget). None = pure BFS order (the reference's ordering).
    # In-wave dedup attribution (which parent claims a URL) stays
    # first-(parent_seq, ordinal) regardless of priority.
    priority_fn: Callable[[dict], int] | None = None

    # hooks (executed in the extract stage, in reference order)
    on_every_page: Callable[[dict], Any] | None = None        # do_page_blocks
    on_pages_like: list[tuple[str, Callable[[dict], Any]]] = field(default_factory=list)
    focus_crawl: Callable[[dict, list[str]], list[str]] | None = None
    skip_link_fn: Callable[[str], bool] | None = None

    # crawl/batch lifecycle hooks (dsl_front_end.rb:154-172). Fired on the
    # driver: before_crawl once before wave 0 (the root-job do_pre_batch,
    # batch_job.rb:219-224), before_batch/after_batch per wave (the
    # reference registers them per batch; execution was left TODO —
    # batch_job.rb:192,199 — we implement the intent), after_crawl once at
    # the end with the page-store analog in ctx (dsl_core.rb:172-174).
    # Each receives a ctx dict ({event, wave, n_jobs, total_jobs,
    # counters, ...}); a returned {key: int} dict is merged into the
    # crawl's counters (the m_cache.incr analog) and persisted in the
    # lineage markers so counters survive kill/resume exactly once.
    before_crawl: Callable[[dict], Any] | None = None
    after_crawl: Callable[[dict], Any] | None = None
    before_batch: Callable[[dict], Any] | None = None
    after_batch: Callable[[dict], Any] | None = None

    def compiled_skip_patterns(self):
        import re

        return [re.compile(p) for p in self.skip_link_patterns]
