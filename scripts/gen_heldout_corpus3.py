#!/usr/bin/env python
"""Freeze the THIRD held-out prose corpus (fixtures/heldout_prose3.jsonl).

Provenance: every paragraph below was hand-composed for this corpus in a
single pass, across eight registers DISJOINT from corpus #1's twelve and
corpus #2's eight (financial and earnings commentary, clinical case
notes, real-estate listings, job postings, biography and profiles,
museum exhibit labels, police blotter and incident reports, gardening
advice).  The text was written WITHOUT consulting the parser, the
lexicon, or the transcript generator, and the file was committed before
the first coverage measurement — unscreened by construction, the same
protocol as corpora #1 and #2 (VERDICT r5 Next #3).  The grammar may be
grown against the failures this corpus exposes; the corpus itself is
frozen and never edited to flatter the parser.

Output format matches fixtures/heldout_prose.jsonl: one JSON object per
line, {"doc_texts": [paragraph]}.
"""
import json
import os

PARAGRAPHS = [
    # --- financial / earnings commentary -------------------------------------
    "Revenue for the quarter rose nine percent to 2.4 billion dollars. The gain came mostly from the subscription segment, which grew for the eighth straight quarter. Hardware sales declined again, and the company expects that slide to continue. Management raised the full-year forecast by a narrow margin.",
    "The board approved a dividend of forty cents per share. The payout marks the first increase in three years and signals confidence in the cash position. Analysts had expected a smaller raise. Shares climbed four percent after the announcement.",
    "Margins narrowed in the retail division despite higher prices. Freight costs ate most of the benefit, and markdowns absorbed the rest. The chief financial officer described the quarter as noisy but acceptable. Inventory levels returned to their normal range by the end of the period.",
    "The fund trimmed its position in the airline sector during March. Fuel prices pressured carriers throughout the spring, and the managers saw better value in rail operators. The letter to investors defended the rotation as defensive rather than opportunistic. Performance for the quarter trailed the benchmark by half a point.",
    "The company restated results for the prior two years after an internal review. The errors involved the timing of license revenue and did not affect cash. The audit committee hired outside counsel and expanded its scope in January. The stock fell hard on the first headline and recovered half the loss within a week.",
    "Currency swings cut four points from reported growth. On a constant-currency basis the international business expanded at a healthy pace. The strongest markets were Brazil and India, where the newest plants run near capacity. Pricing held firm in every region except northern Europe.",
    "The startup raised sixty million dollars in its third funding round. The new money values the firm at roughly nine hundred million. Investors pointed to the retention numbers, which lead the category by a wide margin. The founders plan to double the engineering team within a year.",
    "Interest expense climbed as the company refinanced its oldest notes. The new paper carries a higher coupon but pushes the first maturity to 2031. The treasurer called the trade expensive insurance against a frozen credit market. Rating agencies left the outlook unchanged.",
    "Same-store sales slipped two percent in the quarter. Traffic fell more than ticket size, which suggests fewer visits rather than smaller baskets. The loyalty program added three million members, and digital orders now represent a third of the business. The chain will close forty underperforming locations this year.",
    "The insurer reported a combined ratio of ninety-six percent. Catastrophe losses stayed below the five-year average despite two named storms. Premium growth came from rate increases rather than new policies. The investment portfolio benefited from higher short-term yields.",
    "Guidance for the year assumes no recovery in the advertising market. The chief executive called the assumption conservative on the earnings call. Cost cuts announced in the fall should reach their full effect by summer. Free cash flow remains the stated priority over growth.",
    "The miner shipped record volumes from its northern operations. Spot prices, however, fell faster than costs, and earnings dropped by a third. A weaker local currency cushioned part of the blow. The expansion project remains on schedule and on budget.",
    "Short interest in the stock doubled over the month. Skeptics question whether the order backlog converts to revenue at the promised pace. The company answered with an unusual level of disclosure, publishing delivery dates for its largest contracts. The debate has made the shares the most volatile in the index.",
    # --- clinical case notes ---------------------------------------------------
    "The patient is a 54-year-old man with a three-day history of chest discomfort. The pain worsens with exertion and eases with rest. He reports no fever, no cough, and no recent travel. His father had a heart attack at the age of sixty.",
    "Blood pressure on arrival measured 162 over 94. The examination found a regular rhythm with no murmur. The lungs were clear on both sides, and the abdomen was soft. Laboratory results showed mildly elevated glucose and normal kidney function.",
    "The patient returned for follow-up six weeks after the procedure. The incision healed well, and the swelling resolved. She walks a mile each morning without pain. We discussed a gradual return to tennis after one more month.",
    "A 7-year-old girl presented with a rash on both forearms. The rash appeared two days after a camping trip and itches at night. There were no blisters and no involvement of the face. The family treated the area with a cold compress, which provided partial relief.",
    "The imaging revealed a small stone in the left ureter. The patient passed a similar stone four years ago without intervention. Pain control and fluids remain the plan for the next forty-eight hours. Surgery becomes an option if the stone fails to progress.",
    "The patient denies shortness of breath at rest but notes fatigue after one flight of stairs. Her weight increased by three kilograms since the last visit. The ankles show mild swelling at the end of the day. We increased the diuretic and scheduled an echocardiogram.",
    "Medication review found two prescriptions with overlapping effects. The evening dose duplicates the long-acting tablet taken at breakfast. We discontinued the older agent and kept the newer one. The pharmacy will flag the change at the next refill.",
    "The wound on the left heel measures two centimeters across. The edges look clean, and the base shows healthy tissue. The patient checks his feet each evening as instructed. The nurse will change the dressing twice a week until the area closes.",
    "Sleep has improved since the last appointment. The patient falls asleep within twenty minutes on most nights and wakes once. Caffeine stops at noon, and the bedroom routine stays consistent. We agreed to continue the current plan without medication.",
    "The boy's growth tracks along the fortieth percentile. Vaccinations are current through this visit. The parents asked about a persistent habit of toe-walking. The examination found normal strength and full range of motion, and we will simply observe for now.",
    "The biopsy returned a benign result. The nodule requires no treatment but merits an ultrasound in twelve months. The patient expressed relief and asked about her remaining risk. We reviewed the numbers together and documented the discussion.",
    "The patient completed the course of physical therapy with good effect. Grip strength improved from eighteen to thirty-one kilograms. Night pain no longer wakes her. She will continue the home program and return only if symptoms recur.",
    "An 81-year-old woman arrived after a fall in her kitchen. She did not lose consciousness and remembers the event clearly. X-rays showed no fracture, and the bruise on her hip is expected to heal without issue. A home safety assessment was arranged before discharge.",
    # --- real-estate listings ---------------------------------------------------
    "This corner cottage sits on a quarter-acre lot shaded by old maples. The kitchen was renovated last year with stone counters and new appliances. Three bedrooms share two full baths upstairs. The detached garage holds two cars and a workshop.",
    "Sunlight fills the open living area through floor-to-ceiling windows. The balcony faces the river and catches the evening breeze. Both bedrooms include built-in storage. The building offers a gym, a rooftop terrace, and a package room.",
    "The farmhouse dates to 1902 and keeps its original woodwork. A modern addition added a bright family room and a second furnace. The barn stands in fair condition with a sound roof. Forty acres of pasture surround the house on three sides.",
    "This townhouse ends the row, so windows line three sides. The main floor flows from the entry to a dining space and a walled garden. New carpet runs through the upper level. The basement is dry, tall, and ready to finish.",
    "Commuters will love the location, four blocks from the express stop. The unit itself hides from the street noise at the back of the building. Ceilings reach nine feet, and the oak floors were refinished this spring. Laundry sits inside the unit, not down the hall.",
    "The ranch offers single-level living with wide doorways throughout. The primary suite opens to a patio through sliding doors. Solar panels on the south roof cover most of the electric bill. The sellers are including the hot tub and the storage shed.",
    "Investors should note the separate entrance to the lower level. The space functioned as a legal rental for the past decade. Each floor has its own kitchen and laundry. Current leases run through next August at market rates.",
    "The lake sits a short walk down a private path. The cabin sleeps eight between its two lofts and the bunk room. A stone fireplace anchors the main room. The property comes furnished, including the canoe and the dock.",
    "Builders finished this home in March, and no one has lived in it. The warranty covers structure, systems, and appliances. Buyers can still choose paint colors for two bedrooms. The yard was seeded last month and will green up by summer.",
    "The loft occupies the top floor of a converted mill. Brick walls and timber beams recall the building's working past. The open plan suits an artist or anyone allergic to hallways. Freight elevators remain in service for oversized deliveries.",
    "The asking price reflects the dated kitchen and the fair condition of the roof. Everything else about the house argues for itself. The street is quiet, the lot is level, and the school sits three blocks away. Bring your contractor and your imagination.",
    "A gated drive climbs through olive trees to the main residence. The guest house mirrors the main kitchen at a smaller scale. The pool terrace looks west over the valley. Water rights convey with the land.",
    "This listing covers two adjacent parcels sold together. The smaller parcel carries an approved permit for a second dwelling. Utilities already reach both lots. The survey was completed in the fall and is available on request.",
    # --- job postings ------------------------------------------------------------
    "Our clinic seeks a full-time medical assistant for a busy pediatric practice. The role supports four physicians across intake, vitals, and scheduling. Candidates need a current certification and two years of experience. We offer health coverage, retirement matching, and four weeks of paid leave.",
    "The library invites applications for a youth services coordinator. The coordinator plans programs for readers from birth through high school. Evening hours rotate among the professional staff. A master's degree is preferred but equivalent experience counts.",
    "We need a line cook who stays calm on a Saturday night. The menu changes weekly and leans on local produce. Shifts include two weekend dinners and no Mondays. Pay starts above the county average, and the house shares tips across the whole kitchen.",
    "The district is hiring a bus driver for the eastern routes. Training for the commercial license happens on paid time. The morning run starts at six and ends by nine. A clean driving record for the past five years is required.",
    "A regional carrier seeks an experienced dispatcher for overnight coverage. The dispatcher tracks forty trucks and resolves delays before customers notice. The role demands patience, quick judgment, and clear notes. Experience with routing software helps but is not essential.",
    "Our lab needs a technician for its water quality program. The technician collects samples from sites across three counties and logs results the same day. Fieldwork continues in all seasons, so comfort outdoors matters. A valid driver's license is mandatory.",
    "The museum seeks a part-time visitor services associate. The associate greets guests, answers questions, and supports the membership desk. Weekend availability is essential during the exhibition season. Staff receive free admission to partner institutions.",
    "A growing firm requires a payroll specialist with multi-state experience. The specialist owns the biweekly cycle end to end, from timesheets to filings. Accuracy beats speed in this role, though both matter. The position reports to the controller and works from the office three days a week.",
    "The farm hires seasonal crew for the harvest, from late August through October. Work begins at dawn and finishes by early afternoon. Housing is available on site for a modest weekly rate. Returning workers receive a premium over the base wage.",
    "We are looking for a junior editor who reads everything twice. The editor checks facts, trims copy, and defends the style guide. Most of the desk's output ships before noon. Recent graduates with strong clips are welcome to apply.",
    "The city seeks a code enforcement officer for the downtown district. The officer inspects properties, documents violations, and testifies at hearings when needed. The job mixes office work with time on foot in every kind of weather. Bilingual candidates move to the front of the line.",
    "A veterinary hospital needs an overnight care attendant. The attendant monitors recovering patients, updates charts, and calls the on-duty doctor when something changes. The building stays quiet after midnight, but attention cannot drift. Experience with large dogs is a plus.",
    "Our shop wants an apprentice electrician who shows up early. The apprentice pulls wire, sets boxes, and learns the code one job at a time. Tools and boots are provided after the first month. The path to a license runs through this door.",
    # --- biography / profiles ------------------------------------------------------
    "She grew up above her parents' bakery and learned numbers by counting change. A scholarship carried her to a state university, where she studied chemistry by day and waited tables by night. Her first patent came at twenty-nine. The company she later founded employs four hundred people in her hometown.",
    "He spent two decades as a wildland firefighter before his knees ended the career. The forest service kept him on as a trainer, and his crews still carry his checklists. Retirement bores him, so he builds canoes in a barn behind the house. Each one takes a winter.",
    "The pianist gave her first recital in a church basement at the age of six. Conservatory training in her teens sharpened the technique but nearly dulled the joy. A year away from the instrument restored it. She now performs forty concerts a season and teaches every Friday.",
    "The brothers opened their first garage with one lift and a borrowed compressor. Honest estimates built the reputation that advertising never could. The second location opened across from the high school where they met their first customers. Their nephews run the counter now.",
    "After thirty years on the city desk, she wrote the book she had postponed her whole career. The manuscript traced three families through the flood and its aftermath. Critics praised its patience. She banked the award money and went back to the newsroom.",
    "He defected with a suitcase and a chess set. The grandmaster title came later, in a country whose language he learned from television. His academy in the old neighborhood charges nothing. Champions, he says, come from everywhere.",
    "The sisters inherited a failing orchard and refused every offer to sell. They replaced half the trees, opened the barn for weddings, and pressed cider that won a state fair ribbon. The farm now breaks even with a little left over. The land stays in the family.",
    "Her mapping of the harbor floor changed how the port dredges its channels. Colleagues describe her fieldwork as relentless and her charts as beautiful. The institute named its survey vessel for her on the day she retired. She attended the ceremony and then went back to her tide tables.",
    "The chef trained in three countries and settled in the smallest town of the three. His tasting menu seats twelve people at a single counter. Reservations open on the first of the month and vanish within an hour. He still shops the market himself.",
    "A childhood stutter pushed him toward writing, where the words waited patiently. His radio essays ran for twenty years, read by an actor friend. Listeners knew the voice and not the face. The collected pieces fill three volumes.",
    "She coached the girls' team for thirty-one seasons and never once yelled. Her players remember the drills less than the bus rides, where she learned their lives. Eleven of them coach today. The gym bears her name, over her objection.",
    "The lighthouse keeper's son became an engineer of harbors. His breakwaters stand in nine countries, shaped by storms he studied from childhood. He kept his father's logbooks on a shelf above his desk. The designs, he admitted, began there.",
    "They met in a typing pool and founded a printing business with one secondhand press. Through five recessions the shop never missed a payroll. Their daughter modernized everything except the handshake policy. The original press sits in the lobby, still inked.",
    # --- museum exhibit labels -------------------------------------------------------
    "This bowl was shaped from a single block of maple around 1840. The maker left tool marks visible along the rim, a signature of workshops in the valley. Such bowls served daily use rather than display. The repair on the base speaks to decades of kitchen life.",
    "The locomotive on this platform pulled freight across the divide for forty years. Its boiler was rebuilt twice, and the cab retains the original gauges. Crews nicknamed the engine for its sound on steep grades. It arrived at the museum under its own power in 1968.",
    "The quilt combines fabric from three generations of one household. The oldest patches date to the 1870s, cut from dresses and feed sacks. The pattern, a variation on a traditional star, appears nowhere else in the collection. Family records name four of the makers.",
    "This telescope belonged to a self-taught astronomer who mapped the southern sky from her rooftop. She ground the mirror herself over two winters. Her notebooks, displayed nearby, record a comet discovered with this instrument. The observatory she founded still operates.",
    "The armor on this stand was made for ceremony rather than battle. Its surface carries etched scenes of a hunt, filled with gold leaf. The weight alone would have exhausted any soldier. Such pieces announced wealth at court functions.",
    "These tools belonged to a shipwright who worked the harbor for fifty years. Each handle is worn to the shape of his grip. The adze at the center predates him and likely served his teacher. Shipbuilding by hand ended here within his lifetime.",
    "The mural fragment survived the fire that destroyed the station in 1921. Conservators removed eleven layers of soot over two years. The restored section shows commuters beneath a painted sky. The artist's sketches for the lost portions hang to the right.",
    "This dress was sewn for a graduation that wartime postponed by three years. The silk came from a parachute, a common substitution in those seasons. The owner finally wore it at twenty-one. Her letter describing the day is reproduced beside the case.",
    "The printing block carved on this table produced a newspaper banned twice by the colonial government. Printers hid the block in a flour barrel between editions. Impressions from it taught a generation to read politics. The barrel is the one displayed.",
    "The canoe was built without nails, its planks sewn with spruce root. Builders steamed the cedar over pits on the beach. This example traveled coastal waters for thirty years before a collector bought it. Descendants of the builders advised its restoration.",
    "This switchboard connected the town's first hundred telephones. Operators, mostly young women, memorized every household on the exchange. The board stayed in service until 1954. Former operators recorded the oral histories playing overhead.",
    "The meteorite on this pedestal fell through a barn roof in 1907. The farmer charged neighbors a nickel to see the hole. Scientists traded him a new roof for the stone. Its sliced face reveals a crystal pattern formed in deep space.",
    "The jacket belonged to the expedition's cook, the only member to keep a daily diary. Its pockets still hold a button tin and a pencil stub. The diary contradicts the official account on two points. Both versions are presented here.",
    # --- police blotter / incident reports ----------------------------------------
    "Officers responded to a report of a break-in on Cedar Lane at 2:14 in the morning. The rear door showed pry marks, and a window stood open. The homeowners were away for the weekend. Neighbors reported a white van on the street the previous evening.",
    "A two-vehicle collision closed the bridge for an hour on Tuesday. Both drivers refused medical transport at the scene. The eastbound car crossed the center line, according to witnesses. Citations are pending while the report is finalized.",
    "The department received three calls about a loose horse near the fairgrounds. An officer and a passing rancher cornered the animal by the creek. The horse returned to its pasture without injury. The fence failure has been repaired.",
    "A resident of Birch Street reported a stolen bicycle from an unlocked garage. The bicycle is a red road model with a black seat bag. A similar bicycle was recovered near the depot last month. Owners are reminded to record serial numbers.",
    "Deputies arrested a man on an outstanding warrant during a routine traffic stop. The vehicle was released to a licensed passenger. The man was transported to the county facility without incident. A court date was set for the following Monday.",
    "Firefighters extinguished a small blaze behind the hardware store before midnight. The fire started in a dumpster and scorched the rear wall. A security camera captured two figures leaving the alley. Investigators ask anyone with information to call the station.",
    "The school reported graffiti on the gymnasium's south wall. Paint crews covered the markings by the afternoon. Similar markings appeared at the park pavilion last week. Extra patrols will pass both locations through the month.",
    "A caller reported shouting at an apartment on Fifth Avenue. Officers found a disagreement over a parking space between two tenants. Both parties agreed to put the matter before the building manager. No charges were filed.",
    "A wallet found on the river trail was turned in to the front desk. The wallet contains identification and cash. The owner may claim it during business hours with proof of identity. The finder declined a reward.",
    "An officer checked on a vehicle parked at the overlook after closing hours. The driver was photographing the meteor shower and was unaware of the posted times. A warning was issued, and the driver left the area. The gate has since been marked with reflective tape.",
    "The department investigated a scam call targeting older residents. The caller claims to represent the power company and demands payment by gift card. The utility confirms it never collects payment by phone. Residents who made payments should contact the fraud unit.",
    "A delivery truck struck a low-hanging branch on Mill Road, scattering its load. Traffic was diverted through the fairground entrance for forty minutes. The town crew removed the branch the same day. No injuries were reported.",
    "Two kayakers were assisted to shore after their boats swamped below the dam. Both wore life vests and declined further help. The river gauge stood two feet above its seasonal average. The launch remains closed until the level recedes.",
    # --- gardening advice ------------------------------------------------------------
    "Tomatoes want heat more than they want an early start. Plants set out in cold soil sulk for weeks and never fully recover. Wait until nights hold above ten degrees. A sheet of black plastic warms the bed while you wait.",
    "Prune the apple tree while it sleeps, in the driest week of late winter. Remove crossing branches first, then anything growing straight up. The goal is a shape that lets light reach every fruit. A sharpened blade heals cleaner than a ragged one.",
    "The secret to carrots is patience at the start. The seed can take three weeks to show, and the soil must stay moist the whole time. A board laid over the row holds the moisture and lifts off at the first sprout. Thin the seedlings ruthlessly or the roots will braid.",
    "Compost wants balance more than recipes admit. Browns bring carbon, greens bring nitrogen, and water binds the work together. A pile that smells sour needs more leaves. A pile that does nothing needs a bucket of scraps and a turn with the fork.",
    "Roses forgive poor soil but never forgive wet feet. Plant them high, with the graft knuckle above the surface in mild regions. Morning sun dries the leaves and heads off the spots. Feed lightly after each flush of bloom.",
    "Garlic goes in as the maples turn. Each clove wants four inches of depth and a blanket of straw. Green shoots in November are normal and survive the snow. The harvest comes when half the leaves have browned.",
    "A new lawn starts with ruthless honesty about light. Grass will not thrive under a dense maple no matter the seed blend. Shade mixes buy time, not miracles. Where the light fails, plant what belongs there instead.",
    "Slugs work the night shift, so the gardener must think ahead. A band of crushed shells slows them, and a shallow dish of beer ends them. Water in the morning rather than the evening. Dry nighttime leaves are the cheapest defense.",
    "The pepper harvest doubles with a simple trick. Pick the first fruits small, before they ripen fully. The plant responds by setting more flowers. From August onward, let everything mature to full color.",
    "Divide the daylilies when the clumps go hollow in the middle. A spade splits the crown into fists, each with roots and a fan of leaves. Replant the divisions a foot apart and water them in. They bloom lightly the first year and fully the second.",
    "Raised beds pay for themselves in cold springs. The soil drains early and warms weeks ahead of the ground. Fill them with a mix of compost and native soil, not bagged mix alone. Boards a foot high are plenty.",
    "Save seed from the best plant, not the first plant. Mark it with a ribbon in midsummer and let its fruit ripen past eating stage. Dry the seed on a plate, not a paper towel. Label everything, because memory lies by February.",
    "Water deeply and rarely rather than lightly and often. Shallow watering teaches roots to linger near the surface, where drought finds them first. An inch a week serves most vegetables. A tuna can by the sprinkler measures it honestly.",
]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "fixtures", "heldout_prose3.jsonl")
    with open(out, "w") as f:
        for p in PARAGRAPHS:
            f.write(json.dumps({"doc_texts": [p]}) + "\n")
    print(f"wrote {len(PARAGRAPHS)} paragraphs to {out}")


if __name__ == "__main__":
    main()
