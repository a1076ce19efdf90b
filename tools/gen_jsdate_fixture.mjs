// Generates tests/golden/jsdate_node.json — TZ=UTC-recorded Node output
// of `new Date(s)` (toISOString + en-US long locale) over a curated
// format table plus a seeded deterministic fuzz corpus. Parity oracle
// for webpeel_spark/pure/metadata._parse_js_date (the reference runs
// every publish-date candidate through new Date).
// Usage: TZ=UTC node tools/gen_jsdate_fixture.mjs > tests/golden/jsdate_node.json
function mulberry32(seed){let a=seed>>>0;return function(){a|=0;a=(a+0x6D2B79F5)|0;let t=Math.imul(a^(a>>>15),1|a);t=(t+Math.imul(t^(t>>>7),61|t))^t;return((t^(t>>>14))>>>0)/4294967296;};}

const CURATED = [
  "2023-01-05", "2023-01-05T10:20:30Z", "2023-01-05T10:20:30.123Z",
  "2023-01-05T10:20:30+02:00", "2023-01-05T10:20:30-05:30",
  "2023-01-05T10:20", "2023-01-05T10:20:30", "2023-01-05 10:20:30",
  "2023-1-5", "2023-01", "2021", "1999", "0000", "275760-09-13",
  "2023-13-01", "2023-00-01", "2023-01-00", "2023-01-32", "2023-02-29",
  "2024-02-29", "01/15/2024", "1/5/2023", "13/15/2024", "02/29/2023",
  "January 15, 2024", "Jan 15, 2024", "jan 15, 2024", "January 15 2024",
  "15 January 2024", "15 Jan 2024", "Sep 1, 2020", "Sept 1, 2020",
  "Tue, 15 Aug 2023 10:00:00 GMT", "Tue, 15 Aug 2023 10:00:00 +0200",
  "15 Aug 2023 10:00:00 GMT", "Tue, 15 Aug 23 10:00:00 GMT",
  "Tue, 15 Aug 99 10:00:00 GMT", "Wed Oct 10 20:19:24 +0000 2018",
  "Mon, 32 Aug 2023 10:00:00 GMT",
  "2024-01-15T10:00:00Z extra", "  2024-01-15  ", "",
  "not a date", "15.08.2023", "2023/08/15", "Aug 2023", "August 2023",
  "yesterday", "1692093600000", "0", "12:30", "10:00 AM",
  "2023-08-15T25:00:00Z", "2023-08-15T10:61:00Z", "2023-08-15T10:00:61Z",
  "2023-08-15T23:59:60Z", "+002023-08-15T00:00:00Z",
  "Thu Aug 15 2023", "Thu Aug 15 2023 10:00:00 GMT+0000",
  "August 15, 2023 10:00 PM", "2 weeks ago", "2023-W33", "2023-227",
];

const MONTHS=["January","February","March","April","May","June","July","August","September","October","November","December"];
const ABBR=MONTHS.map(m=>m.slice(0,3));
const rnd=mulberry32(0xDA7E);
const inputs=new Set(CURATED);
const pick=a=>a[Math.floor(rnd()*a.length)];
for(let i=0;i<500;i++){
  const y=1900+Math.floor(rnd()*250), mo=1+Math.floor(rnd()*14), d=1+Math.floor(rnd()*33);
  const h=Math.floor(rnd()*26), mi=Math.floor(rnd()*62), s=Math.floor(rnd()*62);
  const pad=(n,w=2)=>String(n).padStart(w,"0");
  const forms=[
    `${y}-${pad(mo)}-${pad(d)}`,
    `${y}-${mo}-${d}`,
    `${y}-${pad(mo)}-${pad(d)}T${pad(h)}:${pad(mi)}:${pad(s)}Z`,
    `${y}-${pad(mo)}-${pad(d)}T${pad(h)}:${pad(mi)}:${pad(s)}.${pad(Math.floor(rnd()*1000),3)}Z`,
    `${y}-${pad(mo)}-${pad(d)}T${pad(h)}:${pad(mi)}:${pad(s)}${rnd()<0.5?"+":"-"}${pad(Math.floor(rnd()*15))}:${pick(["00","30","45"])}`,
    `${pad(mo)}/${pad(d)}/${y}`, `${mo}/${d}/${y}`,
    `${pick(MONTHS)} ${d}, ${y}`, `${pick(ABBR)} ${d}, ${y}`,
    `${d} ${pick(MONTHS)} ${y}`, `${d} ${pick(ABBR)} ${y}`,
    `${pick(["Mon","Tue","Wed","Thu","Fri","Sat","Sun"])}, ${pad(d)} ${pick(ABBR)} ${y} ${pad(h)}:${pad(mi)}:${pad(s)} ${pick(["GMT","UTC","+0200","-0530"])}`,
    `${pick(["Mon","Tue","Wed"])} ${pick(ABBR)} ${pad(d)} ${pad(h)}:${pad(mi)}:${pad(s)} ${rnd()<0.5?"+0000":"-0800"} ${y}`,
  ];
  inputs.add(pick(forms));
}
const cases=[];
for(const s of inputs){
  const dt=new Date(s);
  let iso=null, loc=null;
  if(!isNaN(dt.getTime())){
    try{ iso=dt.toISOString(); }catch{ iso=null; }
    loc=dt.toLocaleDateString("en-US",{year:"numeric",month:"long",day:"numeric"});
  }
  cases.push([s, iso, loc]);
}
process.stdout.write(JSON.stringify({node:process.version, tz:process.env.TZ||null, seed:"0xDA7E", cases}));
