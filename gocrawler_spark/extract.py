"""Pure-Python page extraction — the byte-parity core.

One function, :func:`extract_page`, reproduces everything the reference
does to a fetched HTML page (links, meta tags, product item, captcha
flag, canonical text), following the goquery/colly semantics pinned in
``htmlmini`` and ``gofuncs``. It is used by BOTH:

* the single-threaded golden simulator (tests / expected outputs), and
* the vectorized ``mapInPandas`` Spark extractor (operators/extraction.py),

so Spark-vs-golden parity reduces to "same function, same bytes".

Reference call graph (per page, colly OnHTML registration order,
/root/reference/pkg/scraper/scraper.go:187-209):
  ExtractLinks -> GetMetaTags -> GetProductDetails -> [GetProductInformation]
  -> [GetProductReviews] -> [DetectCaptcha] -> GetProductPrice(mixup)
"""

from __future__ import annotations

import re as _re

from . import gofuncs as go
from .htmlmini import Sel, parse_html
from .profiles import SiteProfile


def extract_links(dom, base_url: str, profile: SiteProfile) -> list[str]:
    """E1/E2 — link extraction + absolutization.

    mixup.go:84-100 ('a[href]'), amazon.go:100-107 (result-slot links),
    recursion target scraper.go:189-200. Empty hrefs are skipped
    (mixup.go:86-88); fragment-only links absolutize to '' and are
    dropped by colly's Visit. Admission filters (F1/F2/F4..) run later,
    in the frontier pipeline — exactly like colly's requestCheck.
    """
    links = []
    for node in Sel([dom]).find(profile.link_selector).nodes:
        href = node.attrs.get("href", "")
        if href == "":
            continue
        absu = go.absolute_url(base_url, href)
        if absu:
            links.append(absu)
    return links


def extract_meta(dom, profile: SiteProfile) -> dict:
    """E3 — meta-tag projection (mixup.go:66-82).

    NOTE the reference swaps the two: `keywords` is read from
    meta[name="Description"] and `description` from meta[name="Keywords"]
    (mixup.go:72-73). Preserved for parity.
    """
    d = Sel([dom])
    return {
        "og_image": d.find('meta[property="og:image"]').attr("content"),
        "twitter_image": d.find('meta[name="twitter:image"]').attr("content"),
        "keywords": d.find('meta[name="Description"]').attr("content"),
        "description": d.find('meta[name="Keywords"]').attr("content"),
    }


def extract_text(dom) -> str:
    """Canonical page text — the byte-parity invariant column.

    goquery ``.Text()`` over the whole document (all text nodes, document
    order, no normalization), then exactly the reference's whitespace
    pipeline (mixup.go:184-191): remove runs of >=2 spaces
    (`( {2,})`), split on `(\\r\\n|\\r|\\n|\\t)+`, TrimSpace each part,
    keep non-empty, join with '\\n'.
    """
    data = dom.text()
    data = go.SPACE_CLEANER.sub("", data)
    parts = go.DIVIDER.split(data)
    out = [p for p in (go.trim_space(x) for x in parts) if p != ""]
    return "\n".join(out)


def _mixup_product(dom, url: str, profile: SiteProfile) -> dict | None:
    """E4/E5/E6 — Mixup product extraction (mixup.go:103-235).

    Gate: 'sku=' must appear in the URL raw query (mixup.go:105,117).
    Fires per `div.detail` element; the reference overwrites ctx
    "Product" per element, so the LAST div.detail wins. The price
    callback fires per `div.actions`; the save happens there, so a page
    with no div.actions produces NO item (GetProductPrice is where
    saveProduct lives, mixup.go:162).
    """
    if "sku=" not in go.url_raw_query(url):
        return None
    details_els = Sel([dom]).find("div.detail")
    actions_els = Sel([dom]).find("div.actions")
    if not details_els.nodes or not actions_els.nodes:
        return None

    el = Sel([details_els.nodes[-1]])  # last div.detail wins (ctx overwrite)
    name, brand = "", ""
    details: dict[str, str] = {}
    data = el.text()
    data = go.SPACE_CLEANER.sub("", data)
    product_data = go.DIVIDER.split(data)
    detail_count = 0
    for info in product_data:
        info = go.trim_space(info)
        if info != "":
            detail = info.split(":")
            if detail_count == 0:
                name = info
            elif detail_count == 1:
                brand = info
            else:
                if len(detail) > 1:
                    details[go.trim_space(detail[0])] = go.trim_space(detail[1])
            detail_count += 1

    description = (
        el.parent().next_all_filtered("div.productcontent").find("div#tabs-res").text()
    )
    description = go.trim_space(description)

    # E6 — price: spans minus .descartado, text after ':', cleaned;
    # LAST non-empty wins (Each-loop overwrite, mixup.go:120-147).
    price_f = 0.0
    pel = Sel([actions_els.nodes[-1]])
    for span in pel.find("span.preciolistaNewDet, span.precioofertaNewDet").nodes:
        s = Sel([span])
        if s.has_class("descartado"):
            continue
        span_text = s.text()
        text_slice = span_text.split(":")
        text_price = text_slice[1] if len(text_slice) > 1 else ""
        text_price = go.SPACE_CLEANER.sub("", text_price)
        text_price = go.trim_space(text_price)
        if len(text_price) == 0:
            continue
        text_price = text_price.replace("$", "").replace(",", "")
        price_f, _ok = go.parse_float(text_price)

    # SetPrice(Currency.Float64()) -> ToCurrency again (mixup.go:146,155)
    cents = go.to_currency_cents(go.to_currency_cents(price_f) / 100)
    return {
        "id": go.create_id(name, profile.source_store),
        "name": name,
        "brand": brand,
        "description": description,
        "price_cents": cents,
        "rating": 0.0,
        "reviews": [],
        "source_store": profile.source_store,
        "url": url,
        "details": details,
    }


def _amazon_product(dom, url: str, profile: SiteProfile) -> dict | None:
    """E7-E10 — Amazon product extraction (amazon.go:119-288).

    The item is persisted only inside GetProductReviews (amazon.go:284),
    whose selector is `a#customer-reviews-content[href="#"] ~ div.a-row`;
    a product page without that structure produces NO item.
    """
    center = Sel([dom]).find("div#centerCol")
    if not center.nodes:
        return None
    review_rows = Sel([dom]).find('a#customer-reviews-content[href="#"] ~ div.a-row')
    if not review_rows.nodes:
        return None

    el = Sel([center.nodes[-1]])
    name = el.find("span.product-title-word-break").text().strip("\n")
    brand = el.find("div#bylineInfo_feature_div a").text().strip("\n")

    stars = 0.0
    str_stars = el.find("i.a-icon.a-icon-star").text()
    sf = go.fields(str_stars)
    if sf:
        stars, _ = go.parse_float(sf[0])

    str_price = el.find("div#unifiedPrice_feature_div").find(
        "span#priceblock_ourprice"
    ).text()
    str_price = str_price.replace("$", "").replace(",", "")
    price_f, _ = go.parse_float(str_price)

    # E8/E9 — details; selector fires per element in document order, later
    # SetDetails() overwrites (amazon.go:209), so last element wins.
    details: dict[str, str] = {}
    info_els = Sel([dom]).find(
        "div#productDetails_feature_div, div#detailBulletsWrapper_feature_div"
    )
    for node in info_els.nodes:
        d: dict[str, str] = {}
        e = Sel([node])
        if node.attrs.get("id") == "detailBulletsWrapper_feature_div":
            spans = e.find("div#detailBullets_feature_div ul.a-unordered-list li span")
            for span in spans.filter("span.a-text-bold").nodes:
                key = go.KEY_CLEANER.sub("", Sel([span]).text())
                val = go.trim_space(Sel([span]).next().text())
                d[key] = val
        else:
            for row in e.find('table.prodDetTable[id*="productDetails"] tr').nodes:
                r = Sel([row])
                key = go.KEY_CLEANER.sub("", r.children_filtered("th").text())
                td_contents = r.children_filtered("td").contents()
                val_sel = td_contents.filter_fn(
                    lambda i, n: (not n.is_text and n.tag == "span") or n.is_text
                )
                val = go.KEY_CLEANER.sub("", val_sel.text())
                d[key] = val
        details = d  # overwrite (SetDetails)

    # E10 — reviews; fires per matching a-row, SetReviews overwrites, so the
    # last matching row's extraction wins (amazon.go:245-282).
    reviews: list[dict] = []
    for row in review_rows.nodes:
        revs = []
        widget = Sel([row]).find(
            'div[data-hook="top-customer-reviews-widget"] div.a-section.celwidget'
        )
        for element in widget.nodes:
            e = Sel([element])
            author = e.find("span.a-profile-name").text()
            star_fields = go.fields(e.find("i.review-rating span.a-icon-alt").text())
            str_stars_r = star_fields[0] if star_fields else ""
            title = e.find('a[data-hook="review-title"][class*="review-title"] span').text()
            content = go.WS_CLEANER.sub(
                "",
                e.find(
                    'span[data-hook="review-body"] div.reviewText[data-hook="review-collapsed"] span'
                ).text(),
            )
            r_stars, _ = go.parse_float(str_stars_r)
            revs.append(
                {
                    "title": title,
                    "content": content,
                    "author": author,
                    "stars": r_stars,
                    "date": None,  # read and discarded by the reference (amazon.go:255)
                }
            )
        reviews = revs

    return {
        "id": go.create_id(name, profile.source_store),
        "name": name,
        "brand": brand,
        "description": "",
        "price_cents": go.to_currency_cents(price_f),
        "rating": stars,
        "reviews": reviews,
        "source_store": profile.source_store,
        "url": url,
        "details": details,
    }


def detect_captcha(dom) -> bool:
    """F9 — captcha page predicate (amazon.go:290-295)."""
    return bool(Sel([dom]).find("input#captchacharacters").nodes)


def extract_page(url: str, html, profile: SiteProfile) -> dict:
    """Run the full extractor set over one fetched page.

    Returns {links, og_image, twitter_image, keywords, description,
    text, is_captcha, item(None|dict)} — one DOM parse per page (unlike
    the reference, which re-matches selectors per callback; SURVEY §2.9).
    """
    dom = parse_html(html)
    meta = extract_meta(dom, profile)
    out = {
        "links": extract_links(dom, url, profile),
        "text": extract_text(dom),
        "is_captcha": detect_captcha(dom),
        "item": None,
        **meta,
    }
    if profile.name == "amazon":
        out["item"] = _amazon_product(dom, url, profile)
    else:
        out["item"] = _mixup_product(dom, url, profile)
    return out


def extract_proxy_list(html) -> list[dict]:
    """S11 — proxy-list table extraction (switcher.go:118-142).

    Rows of ``table#proxylisttable tbody tr``; per row the ``td`` texts
    map to [ip, port, code, country, anonymity, google, https]
    (ChildrenFiltered("td").Map, switcher.go:120-127). Port uses
    strconv.Atoi with the error ignored — zero-value 0 on junk
    (switcher.go:128); google/ssl compare lowercased text to "yes"
    (switcher.go:129-130). Rows with fewer than 7 cells would panic the
    reference (index out of range); here they are skipped.
    """
    dom = parse_html(html)
    out = []
    for row in Sel([dom]).find("table#proxylisttable tbody tr"):
        cells = [c.node.text() for c in row.children_filtered("td")]
        if len(cells) < 7:
            continue
        # strconv.Atoi: optional sign + digits only, NO trimming; on
        # syntax error the reference ignores err and keeps the 0
        # zero-value; on RANGE error Go returns the int64-clamped value
        # (also kept, since err is ignored) — switcher.go:128
        if _re.fullmatch(r"[+-]?[0-9]+", cells[1]):
            port = min(max(int(cells[1]), -(2**63)), 2**63 - 1)
        else:
            port = 0
        out.append(
            {
                "ip": cells[0],
                "port": port,
                "code": cells[2],
                "country": cells[3],
                "anonymity": cells[4],
                "google": cells[5].lower() == "yes",
                "ssl": cells[6].lower() == "yes",
            }
        )
    return out
