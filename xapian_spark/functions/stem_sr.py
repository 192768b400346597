"""Snowball Serbian stemmer — pure-Python port of
xapian-core/languages/algorithms/serbian.sbl; golden-validated against
xapian-data/stemming/serbian/.

Shape: Cyrillic→Latin transliteration, an ije/je/dj prelude, region mark
(p1 after the first vowel, pulled back for a leading syllabic 'r'), then
three longest-suffix-match tables — Step_1 (unrestricted), Step_2 and
Step_3 (both R1-gated, Step_3 only when Step_2 finds nothing).  Entries
flagged ``nd`` only apply when the word carries no š/đ/č/ć/ž diacritic.
"""

from __future__ import annotations

_V = frozenset("aeiou")
_SA = frozenset("čćžšđ")
_CA = frozenset("bvgdzjklmnprstfhc") | _SA

_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ", "е": "e",
    "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k", "л": "l", "љ": "lj",
    "м": "m", "н": "n", "њ": "nj", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "ћ": "ć", "у": "u", "ф": "f", "х": "h", "ц": "c", "ч": "č",
    "џ": "dž", "ш": "š",
}

# (replacement, needs_no_diacritics, suffixes)
_S1_RAW = (
    ('loga', 0, 'lozi lozima'),
    ('peh', 0, 'pesi pesima'),
    ('vojka', 0, 'vojci'),
    ('bojka', 0, 'bojci'),
    ('jak', 0, 'jaci jacima'),
    ('čajni', 0, 'čajan'),
    ('cajni', 1, 'cajan'),
    ('erni', 0, 'eran'),
    ('larni', 0, 'laran'),
    ('esni', 0, 'esan'),
    ('anjca', 0, 'anjac'),
    ('ajca', 0, 'ajac ajaca'),
    ('ljca', 0, 'ljaca ljac'),
    ('ejca', 0, 'ejac ejaca'),
    ('ojca', 0, 'ojac ojaca'),
    ('ajka', 0, 'ajaka'),
    ('ojka', 0, 'ojaka'),
    ('šca', 0, 'šaca šac'),
    ('ing', 0, 'inzima inzi'),
    ('tvenik', 0, 'tvenici'),
    ('tetika', 0, 'tetici teticima'),
    ('nstva', 0, 'nstava'),
    ('nik', 0, 'nicima'),
    ('tik', 0, 'ticima'),
    ('zik', 0, 'zicima'),
    ('snik', 0, 'snici'),
    ('kusi', 0, 'kuse'),
    ('kusni', 0, 'kusan'),
    ('kustva', 0, 'kustava'),
    ('dušni', 0, 'dušan'),
    ('dusni', 1, 'dusan'),
    ('antni', 0, 'antan'),
    ('bilni', 0, 'bilan'),
    ('tilni', 0, 'tilan'),
    ('avilni', 0, 'avilan'),
    ('silni', 0, 'silan'),
    ('gilni', 0, 'gilan'),
    ('rilni', 0, 'rilan'),
    ('nilni', 0, 'nilan'),
    ('alni', 0, 'alan'),
    ('ozni', 0, 'ozan'),
    ('ravi', 0, 'rave'),
    ('stavni', 0, 'stavan'),
    ('pravni', 0, 'pravan'),
    ('tivni', 0, 'tivan'),
    ('sivni', 0, 'sivan'),
    ('atni', 0, 'atan'),
    ('enta', 0, 'enat'),
    ('tetni', 0, 'tetan'),
    ('pletni', 0, 'pletan'),
    ('šavi', 0, 'šave'),
    ('savi', 1, 'save'),
    ('anta', 0, 'anata'),
    ('ačka', 0, 'ačak ačaka'),
    ('acka', 1, 'acak acaka'),
    ('uška', 0, 'ušak'),
    ('uska', 1, 'usak'),
    ('atka', 0, 'atak ataka atci atcima'),
    ('etka', 0, 'etak etaka'),
    ('itka', 0, 'itak itaka itci'),
    ('otka', 0, 'otak otaka'),
    ('utka', 0, 'utak utaka utci utcima'),
    ('eskna', 0, 'eskan'),
    ('tični', 0, 'tičan'),
    ('ticni', 1, 'tican'),
    ('ojska', 0, 'ojsci'),
    ('esma', 0, 'esama'),
    ('metra', 0, 'metar metara'),
    ('centra', 0, 'centar centara'),
    ('istra', 0, 'istar istara'),
    ('osti', 0, 'ošću'),
    ('osti', 1, 'oscu'),
    ('dba', 0, 'daba'),
    ('čka', 0, 'čcima čci'),
    ('mca', 0, 'mac maca'),
    ('nca', 0, 'naca nac'),
    ('voljni', 0, 'voljan'),
    ('anki', 0, 'anaka'),
    ('vca', 0, 'vac vaca'),
    ('sca', 0, 'saca sac'),
    ('rca', 0, 'raca rac'),
    ('alca', 0, 'aoca alaca alac'),
    ('elca', 0, 'elaca elac'),
    ('olca', 0, 'olaca olac olce'),
    ('njca', 0, 'njac njaca'),
    ('ekta', 0, 'ekata ekat'),
    ('izma', 0, 'izam izama'),
    ('jebi', 0, 'jebe'),
    ('baci', 0, 'baci'),
    ('ašni', 0, 'ašan'),
    ('asni', 1, 'asan'),
)

_S2_RAW = (
    ('sk', 0, 'skijima skijega skijemu skijem skega skemu skem skijim skijih skijoj skijeg skiji skije skija skoga skome skomu skima skog skom skim skih skoj ski ske sko ska sku'),
    ('šk', 0, 'škijima škijega škijemu škijem škega škemu škem škijim škijih škijoj škijeg škiji škije škija škoga škome škomu škima škog škom škim ških škoj ški ške ško ška šku'),
    ('stv', 0, 'stvima stvom stvo stva stvu'),
    ('štv', 0, 'štvima štvom štvo štva štvu'),
    ('tanij', 0, 'tanijama tanijima tanijom tanija taniju tanije taniji'),
    ('manij', 0, 'manijama manijima manijom manija maniju manije maniji'),
    ('panij', 0, 'panijama panijima panijom panija paniju panije paniji'),
    ('ranij', 0, 'ranijama ranijima ranijom ranija raniju ranije raniji'),
    ('ganij', 0, 'ganijama ganijima ganijom ganija ganiju ganije ganiji'),
    ('an', 0, 'aninom anina aninu anine anima anin anom anu ani ana ane anemu anega aneg anem'),
    ('in', 0, 'inima inama inom ina ine ini inu ino'),
    ('on', 0, 'onovima onova onove onovi onima onom ona one oni onu'),
    ('n', 0, 'nijima nijega nijemu nijeg nijem nega nemu neg nem nijim nijih nijoj niji nije nija niju nima nome nomu noga noj nom nih nim nog no ne na nu ni nuvši nusmo nuste nući nimo nite nemo nete nula nulo nule nuli nuto nuti nuta neš nuo nut'),
    ('ać', 0, 'aćoga aćome aćomu aćega aćemu aćima aćoj aćih aćom aćeg aćem aćog aćuh aćim aće aća'),
    ('eć', 0, 'ećoga ećome ećomu ećega ećemu ećima ećoj ećih ećom ećeg ećem ećog ećuh ećim eće eća'),
    ('uć', 0, 'ućoga ućome ućomu ućega ućemu ućima ućoj ućih ućom ućeg ućem ućog ućuh ućim uće uća'),
    ('ugov', 0, 'ugovima ugovi ugove ugova'),
    ('ug', 0, 'ugama ugom uga uge ugi ugu ugo'),
    ('log', 0, 'logama logom loga logu loge'),
    ('g', 0, 'govima gama govi gove gova gom ga ge gi gu go'),
    ('rari', 0, 'rarijem rarija rariju rario'),
    ('oti', 0, 'otijem otija otiju otio'),
    ('si', 0, 'sijem sija siju sio'),
    ('li', 0, 'lijem lija liju lio'),
    ('uj', 0, 'ujući ujemo ujete ujmo ujem uješ uje uju'),
    ('caj', 0, 'cajevima cajevi cajeva cajeve cajama cajima cajem caja caje caji caju'),
    ('čaj', 0, 'čajevima čajevi čajeva čajeve čajama čajima čajem čaja čaje čaji čaju'),
    ('ćaj', 0, 'ćajevima ćajevi ćajeva ćajeve ćajama ćajima ćajem ćaja ćaje ćaji ćaju'),
    ('đaj', 0, 'đajevima đajevi đajeva đajeve đajama đajima đajem đaja đaje đaji đaju'),
    ('laj', 0, 'lajevima lajevi lajeva lajeve lajama lajima lajem laja laje laji laju'),
    ('raj', 0, 'rajevima rajevi rajeva rajeve rajama rajima rajem raja raje raji raju'),
    ('bij', 0, 'bijima bijama bijom bija bije biji biju bijo'),
    ('cij', 0, 'cijima cijama cijom cija cije ciji ciju cijo'),
    ('dij', 0, 'dijima dijama dijom dija dije diji diju dijo'),
    ('lij', 0, 'lijima lijama lijom lije liji lijo'),
    ('nij', 0, 'nijama nijom nijo'),
    ('mij', 0, 'mijima mijama mijom mija mije miji miju mijo'),
    ('žij', 0, 'žijima žijama žijom žija žije žiji žiju žijo'),
    ('gij', 0, 'gijima gijama gijom gija gije giji giju gijo'),
    ('fij', 0, 'fijima fijama fijom fija fije fiji fiju fijo'),
    ('pij', 0, 'pijima pijama pijom pija pije piji piju pijo'),
    ('rij', 0, 'rijima rijama rijom rija rije riji riju rijo'),
    ('sij', 0, 'sijima sijama sijom sije siji sijo'),
    ('tij', 0, 'tijima tijama tijom tija tije tiji tiju tijo'),
    ('zij', 0, 'zijima zijama zijom zija zije ziji ziju zijo'),
    ('nal', 0, 'nalima nalama nalom nala nale nali nalu nalo'),
    ('ijal', 0, 'ijalima ijalama ijalom ijala ijale ijali ijalu ijalo'),
    ('ozil', 0, 'ozilima ozilom ozila ozile ozilu ozili'),
    ('olov', 0, 'olovima olovi olova olove'),
    ('ol', 0, 'olima olom ola olu ole oli'),
    ('lem', 0, 'lemama lemima lemom lema leme lemi lemu lemo'),
    ('ram', 0, 'ramama ramom rama rame rami ramu ramo'),
    ('ar', 0, 'arama arima arom aru ara are ari'),
    ('dr', 0, 'drama drima drom dru dra dre dri'),
    ('er', 0, 'erama erima erom eru era ere eri'),
    ('or', 0, 'orama orima orom oru ora ore ori'),
    ('es', 0, 'esima esom ese esa esu'),
    ('is', 0, 'isima isom ise isa isu'),
    ('taš', 0, 'tašama tašima tašom tašem taša tašu taši taše'),
    ('naš', 0, 'našama našima našom našem naša našu naši naše'),
    ('jaš', 0, 'jašama jašima jašom jašem jaša jašu jaši jaše'),
    ('kaš', 0, 'kašama kašima kašom kašem kaša kašu kaši kaše'),
    ('baš', 0, 'bašama bašima bašom bašem baša bašu baši baše'),
    ('gaš', 0, 'gašama gašima gašom gašem gaša gašu gaši gaše'),
    ('vaš', 0, 'vašama vašima vašom vašem vaša vašu vaši vaše'),
    ('eš', 0, 'ešima ešama ešom ešem eši eše eša ešu'),
    ('iš', 0, 'išima išama išom išem iši iše iša išu'),
    ('ikat', 0, 'ikatima ikatom ikata ikate ikati ikatu ikato'),
    ('lat', 0, 'latima latom lata late lati latu lato'),
    ('et', 0, 'etama etima etom eta ete eti etu eto etavši etući etemo etimo etem eteš'),
    ('est', 0, 'estima estama estom esta este esti estu esto'),
    ('ist', 0, 'istima istama istom ista iste isti istu isto'),
    ('kst', 0, 'kstima kstama kstom ksta kste ksti kstu ksto'),
    ('ost', 0, 'ostima ostama ostom osta oste osti ostu osto'),
    ('išt', 0, 'ištima ištem išta ište ištu'),
    ('ova', 0, 'ovasmo ovaste ovahu ovati ovaše ovali ovala ovale ovalo ovat ovah ovao'),
    ('av', 0, 'avijemu avijima avijega avijeg avijem avemu avega aveg avem avijim avijih avijoj avoga avome avomu avima avama aviji avije avija aviju avim avih avoj avom avog avi ava avu ave avo'),
    ('ev', 0, 'evijemu evijima evijega evijeg evijem evemu evega eveg evem evijim evijih evijoj evoga evome evomu evima evama eviji evije evija eviju evim evih evoj evom evog evi eva evu eve evo'),
    ('iv', 0, 'ivijemu ivijima ivijega ivijeg ivijem ivemu ivega iveg ivem ivijim ivijih ivijoj ivoga ivome ivomu ivima ivama iviji ivije ivija iviju ivim ivih ivoj ivom ivog ivi iva ivu ive ivo'),
    ('ov', 0, 'ovijemu ovijima ovijega ovijeg ovijem ovemu ovega oveg ovijim ovijih ovijoj ovoga ovome ovomu ovima oviji ovije ovija oviju ovim ovih ovoj ovom ovog ovi ova ovu ove ovo'),
    ('mov', 0, 'movima movom mova movu move movi'),
    ('lov', 0, 'lovima lovom lova lovu love lovi'),
    ('el', 0, 'elijemu elijima elijega elijeg elijem elemu elega eleg elem elijim elijih elijoj eloga elome elomu elima eliji elije elija eliju elim elih eloj elom elog eli ela elu ele elo'),
    ('anj', 0, 'anjijemu anjijima anjijega anjijeg anjijem anjemu anjega anjeg anjem anjijim anjijih anjijoj anjoga anjome anjomu anjima anjiji anjije anjija anjiju anjim anjih anjoj anjom anjog anja anje anji anjo anju'),
    ('enj', 0, 'enjijemu enjijima enjijega enjijeg enjijem enjemu enjega enjeg enjem enjijim enjijih enjijoj enjoga enjome enjomu enjima enjiji enjije enjija enjiju enjim enjih enjoj enjom enjog enja enje enji enjo enju'),
    ('šnj', 0, 'šnjijemu šnjijima šnjijega šnjijeg šnjijem šnjemu šnjega šnjeg šnjem šnjijim šnjijih šnjijoj šnjoga šnjome šnjomu šnjima šnjiji šnjije šnjija šnjiju šnjim šnjih šnjoj šnjom šnjog šnja šnje šnji šnjo šnju'),
    ('en', 0, 'enemu enega eneg enem'),
    ('šn', 0, 'šnemu šnega šneg šnem'),
    ('čin', 0, 'činama činome činomu činoga činima činog činom činim činih činoj čina činu čini čino čine'),
    ('roši', 0, 'rošivši rošismo rošiste rošiše rošimo rošite rošiti rošili rošila rošilo rošile rošim rošiš rošit roših rošio'),
    ('oš', 0, 'ošijemu ošijima ošijega ošijeg ošijem ošemu ošega ošeg ošem ošijim ošijih ošijoj ošoga ošome ošomu ošima ošiji ošije ošija ošiju ošim oših ošoj ošom ošog oši oša ošu oše'),
    ('evit', 0, 'evitijima evitijega evitijemu evitijem evitega evitemu evitem evitijim evitijih evitijoj evitijeg evitiji evitije evitija evitoga evitome evitomu evitima evitog evitom evitim evitih evitoj eviti evite evito evita evitu'),
    ('ovit', 0, 'ovitijima ovitijega ovitijemu ovitijem ovitega ovitemu ovitem ovitijim ovitijih ovitijoj ovitijeg ovitiji ovitije ovitija ovitoga ovitome ovitomu ovitima ovitog ovitom ovitim ovitih ovitoj oviti ovite ovito ovita ovitu'),
    ('ast', 0, 'astijima astijega astijemu astijem astega astemu astem astijim astijih astijoj astijeg astiji astije astija astoga astome astomu astima astog astom astim astih astoj asti aste asto asta astu'),
    ('k', 0, 'kijemu kijima kijega kijeg kijem kemu kega keg kem kijim kijih kijoj koga kome komu kima kiji kije kija kiju kim kih koj kom kog kov ki ka ku ke ko'),
    ('eva', 0, 'evajući evasmo evaste evajmo evajte evaju evala evale evali evalo evamo evana evane evani evano evate evati evaše evahu evah evaj evam evan evao evat evav evaš'),
    ('ava', 0, 'avajući avasmo avaste avajmo avajte avaju avala avale avali avalo avamo avana avane avani avano avate avati avaše avahu avah avaj avam avan avao avat avav avaš'),
    ('iva', 0, 'ivajući ivasmo ivaste ivajmo ivajte ivaju ivala ivale ivali ivalo ivamo ivana ivane ivani ivano ivate ivati ivaše ivahu ivah ivaj ivam ivan ivao ivat ivav ivaš'),
    ('uva', 0, 'uvajući uvasmo uvaste uvajmo uvajte uvaju uvala uvale uvali uvalo uvamo uvana uvane uvani uvano uvate uvati uvaše uvahu uvah uvaj uvam uvan uvao uvat uvav uvaš'),
    ('ir', 0, 'irujemo irujete irujući irajući irivat irujem iruješ irujmo irujte iravši irasmo iraste irati iramo irate iraju iraše irahu irala iralo irali irale iruje iruju iruj iral iran iram iraš irat irah irao'),
    ('ač', 0, 'ačismo ačiste ačiti ačimo ačite ačiše ačeći ačila ačilo ačili ačile ačena ačeno ačeni ačene ačio ačim ačiš ačit ačih ačen ači ače'),
    ('ača', 0, 'ačavši ačasmo ačaste ačahu ačati ačamo ačate ačaše ačala ačalo ačali ačale ačaju ačana ačano ačani ačane ačao ačam ačaš ačat ačah ačan'),
    ('ni', 0, 'nivši nismo niste niti nila nilo nile nili niš nio'),
    ('a', 0, 'ajući avši asmo ajmo ajte ajem aloj amo ate aje aju ati aše ahu ala ali ale alo ano at ah ao aj an am aš alama alima alom alu al'),
    ('ur', 0, 'urajući urasmo uraste urajmo urajte uramo urate uraju urati uraše urahu urala urali urale uralo urana urano urani urane ural urat urah urao uraj uran uram uraš'),
    ('astaj', 0, 'astajasmo astajaste astajahu astajati astajemo astajete astajaše astajali astajući astajala astajalo astajale astajmo astajao astajem astaješ astajat astajah astajte astaje astaju'),
    ('istaj', 0, 'istajasmo istajaste istajahu istajati istajemo istajete istajaše istajali istajući istajala istajalo istajale istajmo istajao istajem istaješ istajat istajah istajte istaje istaju'),
    ('ostaj', 0, 'ostajasmo ostajaste ostajahu ostajati ostajemo ostajete ostajaše ostajali ostajući ostajala ostajalo ostajale ostajmo ostajao ostajem ostaješ ostajat ostajah ostajte ostaje ostaju'),
    ('aj', 0, 'ajevima ajevi ajeva ajeve ajama ajima aja aji'),
    ('asta', 0, 'astadosmo astadoste astadoše astanemo astademo astanete astadete astanimo astanite astanila astavši astanem astadem astaneš astadeš astadoh astade astati astane astanu astadu astala astali astalo astale astat astao'),
    ('ista', 0, 'istadosmo istadoste istadoše istanemo istademo istanete istadete istanimo istanite istanila istavši istanem istadem istaneš istadeš istadoh istade istati istane istanu istadu istala istali istalo istale istat istao'),
    ('osta', 0, 'ostadosmo ostadoste ostadoše ostanemo ostademo ostanete ostadete ostanimo ostanite ostanila ostavši ostanem ostadem ostaneš ostadeš ostadoh ostade ostati ostane ostanu ostadu ostala ostali ostalo ostale ostat ostao'),
    ('ta', 0, 'tasmo taste tajmo tajte tavši tati tamo tate taju tala talo tale tali tana tano tani tane tan taj tao tam taš tat tah'),
    ('inj', 0, 'injasmo injaste injati injemo injete injali injala injalo injale injaše injahu injem inješ injat injah injao'),
    ('as', 0, 'astemo astete astimo astite astući asteš asli asla aslo asle'),
    ('i', 0, 'ivši ieći ismo imo ite iti ili ila ilo ile im iš it ih io ijemo ijete ijem iješ ijmo ijte iju ije ij ilu ilama ilima ilom il'),
    ('luč', 0, 'lučujete lučujući lučujemo lučujem lučuješ lučismo lučiste lučujmo lučujte lučuje lučuju lučiše lučiti lučimo lučite lučila lučilo lučili lučile lučena lučeno lučeni lučene lučuj lučio lučen lučim lučiš lučit lučih luče luči'),
    ('jeti', 0, 'jetismo jetiste jetiše jetimo jetite jetiti jetili jetila jetilo jetile jetim jetiš jetit jetih jetio'),
    ('e', 0, 'emo em eš elama el'),
    ('at', 0, 'atijega atijemu atijima atijeg atijem atega atemu ateg atem atijih atijim atima atoga atome atomu atiji atije atija atiju atoj atog atom atim atih ata atu ato'),
    ('luc', 1, 'lucujuci lucujemo lucujete lucujem lucujes lucujmo lucujte lucismo luciste luciti lucite lucise lucuje lucuju lucila lucile lucili lucilo lucena luceni lucene luceno lucimo lucim lucis lucih lucit lucio lucuj lucen luce luci'),
    ('snj', 1, 'snjijima snjijemu snjijega snjijim snjijih snjijeg snjijoj snjiji snjija snjije snjiju snjima snjemu snjomu snjome snjega snjoga snjih snjim snjem snjom snjeg snjog snjoj snja snje snji snjo snju'),
    ('os', 1, 'osijima osijemu osijega snjijem osijih osijim osijem osijeg osijoj osima osemu osomu osome osega osoga osija osije osiji osiju osih osim osem osom oseg osog osoj osa ose osi osu'),
    ('ac', 1, 'acismo aciste acima acimo acome acomu acite aciti acise acila acile acili acilo acega acene aceci aceni acemu acena aceno acoga acoj acih acem acom acen acog acit acio aceg acim acuh acis ace aca aci'),
    ('ec', 1, 'ecome ecoga ecemu ecima ecega ecomu ecoj ecuh ecom ecog eceg ecih ecem ecim eca ece'),
    ('uc', 1, 'ucomu ucome ucima ucoga ucega ucemu ucih ucog uceg ucom ucem ucim ucuh ucoj uca uce'),
    ('rosi', 1, 'rosismo rosivsi rosiste rositi rosili rosise rosite rosilo rosimo rosile rosila rosit rosis rosio rosim rosih'),
    ('aca', 1, 'acavsi acaste acasmo acaju acane acate acali acani acati acale acahu acase acano acamo acalo acana acala acam acan acao acas acat acah'),
    ('jas', 1, 'jasima jasama jasem jasom jase jasi jasa jasu'),
    ('tas', 1, 'tasima tasama tasem tasom tase tasa tasu tasi'),
    ('gas', 1, 'gasima gasama gasem gasom gasi gasu gase gasa'),
    ('nas', 1, 'nasama nasima nasem nasom nasu nasi nase nasa'),
    ('kas', 1, 'kasama kasima kasom kasem kasi kasu kase kasa'),
    ('vas', 1, 'vasama vasima vasom vasem vasi vase vasa vasu'),
    ('bas', 1, 'basama basima basom basem basi base basu basa'),
    ('as', 1, 'astuci astes'),
    ('cin', 1, 'cinima cinome cinama cinomu cinoga cinom cinih cinim cinog cinoj cino cini cinu cine cina'),
    ('astaj', 1, 'astajase astajuci astajes'),
    ('istaj', 1, 'istajase istajuci istajes'),
    ('ostaj', 1, 'ostajase ostajuci ostajes'),
    ('asta', 1, 'astadose astades astanes astavsi'),
    ('ista', 1, 'istadose istades istanes istavsi'),
    ('osta', 1, 'ostadose ostades ostanes ostavsi'),
    ('ava', 1, 'avajuci avase avas'),
    ('eva', 1, 'evajuci evase evas'),
    ('iva', 1, 'ivajuci ivase ivas'),
    ('uva', 1, 'uvajuci uvase uvas'),
    ('ova', 1, 'ovase'),
    ('jeti', 1, 'jetise jetis'),
    ('inj', 1, 'injase injes'),
    ('ist', 1, 'istem'),
    ('es', 1, 'esama esem esi'),
    ('et', 1, 'etavsi etuci etes'),
    ('is', 1, 'isama isem isi'),
    ('ir', 1, 'irajuci irujuci irujes iravsi irase iras'),
    ('ur', 1, 'urajuci urase uras'),
    ('uj', 1, 'ujuci ujes'),
    ('ni', 1, 'nivsi nis'),
    ('sn', 1, 'snega snemu snem sneg'),
    ('ta', 1, 'tavsi tas'),
    ('a', 1, 'ajuci avsi ase as'),
    ('i', 1, 'ijes ivsi ieci is'),
    ('e', 1, 'es'),
    ('n', 1, 'nuvsi nuci nes'),
)

_S3_RAW = (
    ('', 0, 'enom enoj enog enim enih anoj anog anim anih ost eno eni oga ima enu ena ama ano ani om og u o i e a'),
)


def _index(raw):
    by_len: dict[int, dict[str, tuple[int, str]]] = {}
    for rep, nd, sufs in raw:
        for s in sufs.split():
            by_len.setdefault(len(s), {})[s] = (nd, rep)
    return sorted(by_len, reverse=True), by_len


_L1, _T1 = _index(_S1_RAW)
_L2, _T2 = _index(_S2_RAW)
_L3, _T3 = _index(_S3_RAW)


def _prelude(w: str) -> str:
    w = "".join(_CYR.get(c, c) for c in w)
    for pat in ("ije", "je"):
        i, k = 0, len(pat)
        while i < len(w):
            if (w[i] in _CA and w[i + 1:i + 1 + k] == pat
                    and i + 1 + k < len(w) and w[i + 1 + k] in _CA):
                w = w[: i + 1] + "e" + w[i + 1 + k:]
            i += 1
    i = 0
    while i < len(w):
        if w[i:i + 2] == "dj":
            w = w[:i] + "đ" + w[i + 2:]
        i += 1
    return w


def _mark_p1(w: str) -> int:
    n = len(w)
    p1 = n
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            j = p1
            while j < n and w[j] in _V:
                j += 1
            if j < n:
                p1 = j + 1
    i = 0
    while i < n and w[i] != "r":
        i += 1
    if i < n:
        cur = i + 1
        if cur < 2:
            j = cur
            while j < n and w[j] == "r":
                j += 1
            cur = j + 1 if j < n else -1
        if cur != -1 and p1 - cur > 1:
            p1 = cur
    return p1


def _apply(w: str, lens, tab, p1: int | None, nd_ok: bool):
    """Longest-suffix among; R1 gate when p1 given. Returns new word or None."""
    n = len(w)
    for L in lens:
        if L > n:
            continue
        hit = tab[L].get(w[n - L:])
        if hit is not None:
            nd, rep = hit
            if p1 is not None and n - L < p1:
                return None
            if nd and not nd_ok:
                return None
            return w[: n - L] + rep
    return None


def stem_serbian(word: str) -> str:
    w = _prelude(word)
    nd_ok = not any(c in _SA for c in w)
    p1 = _mark_p1(w)
    w2 = _apply(w, _L1, _T1, None, nd_ok)
    if w2 is not None:
        w = w2
    w2 = _apply(w, _L2, _T2, p1, nd_ok)
    if w2 is None:
        w2 = _apply(w, _L3, _T3, p1, nd_ok)
    return w2 if w2 is not None else w
