// Records Node's actual evaluation of the reference's URL-keyed SPA
// auto-render decision (core/pipeline.ts:361-401): exact
// `new URL(url).hostname` membership in the DEFAULT_SPA_DOMAINS set,
// else SPA_URL_PATTERNS regex test on the raw url, both inside the
// try/catch (an unparseable URL skips detection).  The tables are the
// spec (they define the output) — the logic below re-states the three
// lines of consumption, it is not transcribed engine code.
//
//   node tools/gen_spa_fixture.mjs > tests/golden/spa_detection_node.json

const SPA_DOMAINS = new Set([
  'www.google.com', 'flights.google.com',
  'www.airbnb.com', 'www.booking.com', 'www.expedia.com',
  'www.kayak.com', 'www.skyscanner.com', 'www.tripadvisor.com',
  'www.indeed.com', 'www.glassdoor.com',
  'www.zillow.com',
  'polymarket.com', 'www.polymarket.com',
  'app.webpeel.dev',
]);
const SPA_URL_PATTERNS = [
  /google\.com\/travel/, /google\.com\/maps/, /google\.com\/shopping/,
];

function isSpaUrl(url) {
  try {
    const hostname = new URL(url).hostname;
    if (SPA_DOMAINS.has(hostname)) return true;
    if (SPA_URL_PATTERNS.some((p) => p.test(url))) return true;
    return false;
  } catch {
    return false;
  }
}

const cases = [];
const urls = [];

// every domain in the set, with path/query/port/case variants
for (const d of SPA_DOMAINS) {
  urls.push(`https://${d}/`);
  urls.push(`https://${d}/search?q=x`);
  urls.push(`http://${d.toUpperCase()}/CaseFold`);
  urls.push(`https://${d}:8443/port`);
  urls.push(`https://user:pw@${d}/auth`);
}
// exact-match semantics: bare/suffix/superstring hosts must MISS
for (const d of ['google.com', 'airbnb.com', 'zillow.com',
                 'm.airbnb.com', 'wwww.google.com', 'www.google.com.evil.io',
                 'notwww.zillow.com', 'www.booking.com.phish.net']) {
  urls.push(`https://${d}/`);
  urls.push(`https://${d}/rooms/123`);
}
// pattern half: hits via path on NON-listed hosts, raw-string hits,
// and places the pattern appears outside the host+path boundary
urls.push('https://www.google.com/travel/flights');
urls.push('https://google.com/travel');            // host misses set, pattern hits
urls.push('https://google.com/maps/place/x');
urls.push('https://google.com/shopping?q=tv');
urls.push('https://maps.google.com/maps');         // pattern needs google.com/maps substring
urls.push('https://evil.example/google.com/travel');  // substring in path → JS regex hits
urls.push('https://example.com/?u=https://google.com/maps');
urls.push('https://google.com/travels');           // superstring still matches /travel/
urls.push('https://google.com/Travel');            // case-sensitive regex → miss
urls.push('https://GOOGLE.COM/travel');            // raw string case-sensitive: pattern on raw → miss, host lowercased
urls.push('https://google.com/shop');              // prefix only → miss
// parse failures: detection (incl. patterns) skipped entirely
urls.push('google.com/travel');                    // no scheme → throw → false
urls.push('https://exa mple.com/google.com/maps'); // space in host → throw
urls.push('http://');                              // empty host → throw
urls.push('');
// authority-less but PARSEABLE url with a pattern substring → pattern applies
urls.push('data:text/html,go to google.com/maps now');
urls.push('mailto:someone@google.com/travel');
urls.push('file:///tmp/google.com/shopping.html');
// non-special with authority
urls.push('foo://www.google.com/x');               // hostname match on non-special
urls.push('ws://www.zillow.com/socket');
// IDN / punycode / IPv6 / trailing-dot edge hosts
urls.push('https://www.gοogle.com/');              // greek omicron → punycoded host ≠ entry
urls.push('https://www.google.com./');             // trailing dot hostname keeps the dot → miss
urls.push('https://[2001:db8::1]/google.com/travel');
urls.push('https://www.airbnb.com%2Fx/');          // %2F in host → throw
// hash/fragment variants
urls.push('https://www.kayak.com/#!/deck');
urls.push('https://other.site/#google.com/maps');

for (const u of urls) cases.push({ url: u, spa: isSpaUrl(u) });

process.stdout.write(JSON.stringify(
  { node: process.version, cases }, null, 1) + '\n');
