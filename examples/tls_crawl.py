"""HTTPS + compressed-transfer crawl over real sockets — the deployment
story for the round-5 wire features (reference capability: Net::HTTP SSL
with VERIFY_NONE + auto-inflate, http.rb:188-190).

Spins a loopback TLS origin (self-signed cert; requires the ``cryptography``
wheel) that gzips every body, then runs the FULL distributed crawl engine
against it with ``HttpNet`` — politeness on the wall clock, robots fetched
over TLS, Content-Encoding inflated before extraction — and checks the
result against the serial oracle running on a ``SyntheticNet`` of the same
https site table. Point ``HttpNet()`` (default: encrypt, trust any cert;
``tls_verify=True`` + ``ca_file`` to pin) at real hosts to run this on the
open web.

Run: python examples/tls_crawl.py
"""

from __future__ import annotations


def main(tmp_dir: str = "/tmp/ccray_example_tls"):
    import sys

    sys.path.insert(0, "/root/repo")  # tests.loopback (the shared origin)
    from cloud_crawler_ray.oracle import crawl_oracle
    from cloud_crawler_ray.pipelines.crawl import crawl
    from cloud_crawler_ray.spec import CrawlSpec
    from cloud_crawler_ray.stages.httpnet import HttpNet
    from cloud_crawler_ray.synthweb import FakePage, page_url, web_table
    from tests.loopback import serve_site

    with serve_site(tls=True, compress="gzip") as srv:
        mk = lambda **kw: FakePage(host=srv.netloc, scheme="https", **kw)
        pages = [
            mk(name="p0", links=["docs", "blog"], media=[("img", "/hero.png")]),
            mk(name="docs", links=["blog"]),
            mk(name="blog", links=["p0"]),
        ]
        web = web_table(pages, scheme="https")
        srv.load(web)
        seeds = [page_url("p0", srv.netloc, "https")]
        spec = CrawlSpec(delay=0.05)

        net = HttpNet(
            port_map={"127.0.0.1": srv.server_address[1]},
            scheme_map={"127.0.0.1": "https"},
        )
        handle = crawl(net, seeds, spec, tmp_dir)
        got = [(r["wave"], r["seq"], r["url"]) for r in handle.crawl_order().take_all()]
        expect = crawl_oracle(web, seeds, spec).crawl_order
        return {"order_matches_oracle": got == expect, "pages": len(got)}


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    print(main())
    ray.shutdown()
