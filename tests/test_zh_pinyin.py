"""ZH g2p: full-coverage character table + polyphone word regression corpus.

The reference resolves hanzi via jieba + pypinyin + ToneSandhi
(/root/reference/text/chinese.py:79-184). This suite pins the self-contained
replacement: layer-3 table coverage by character frequency, and a >=100-case
polyphone corpus covering the words whose readings differ from per-character
defaults (银行/行长/重庆/还钱/乐/得/着/...).
"""

import os

import pytest

from bert_vits2_tpu.text import mandarin
from bert_vits2_tpu.text.cleaner import clean_text
from bert_vits2_tpu.text.mandarin_lexicon import (
    CHAR_PINYIN,
    WORD_PINYIN,
    ext_pinyin,
)

# (sentence, target word, expected tone-numbered syllables).
# Sentences avoid 3-3 sandhi and 不/一 sandhi inside the asserted span so
# the expected tones survive ToneSandhi unchanged.
POLYPHONE_CORPUS = [
    # --- round-4 expansion (VERDICT r3 item 7): 163-case candidate
    # sweep over ~60 more polyphonic characters; expectations are
    # post-sandhi, incl. the reference's 的/地/得 neutralization
    # quirk (tone_sandhi.py) ---
    ("得到大家的认可", "得到", ["de2", "dao4"]),
    ("土地肥沃", "土地", ["tu3", "di5"]),
    ("他慢慢地走", "地", ["de5"]),
    ("目的明确", "目的", ["mu4", "di5"]),
    ("他看着我笑", "看着", ["kan4", "zhe5"]),
    ("大家都很着急", "着急", ["zhao2", "ji2"]),
    ("厨房着火了", "着火", ["zhao2", "huo3"]),
    ("了解情况之后再说", "了解", ["liao2", "jie3"]),
    ("他已经走了", "了", ["le5"]),
    ("去理发店理发", "理发", ["li3", "fa4"]),
    ("发现新大陆", "发现", ["fa1", "xian4"]),
    ("数学老师来了", "数学", ["shu4", "xue2"]),
    ("教书育人是本分", "教书", ["jiao1", "shu1"]),
    ("教育改革推进", "教育", ["jiao4", "yu4"]),
    ("农民种地干活", "种地", ["zhong4", "di5"]),
    ("种子发芽了", "种子", ["zhong3", "zi5"]),
    ("种类繁多", "种类", ["zhong3", "lei4"]),
    ("传记文学很好看", "传记", ["zhuan4", "ji4"]),
    ("传达上级命令", "传达", ["chuan2", "da2"]),
    ("当天晚上就出发", "当天", ["dang4", "tian1"]),
    ("把它当作礼物", "当作", ["dang4", "zuo4"]),
    ("当然可以", "当然", ["dang1", "ran2"]),
    ("小心上当受骗", "上当", ["shang4", "dang4"]),
    ("因为下雨取消了", "因为", ["yin1", "wei4"]),
    ("成为好朋友", "成为", ["cheng2", "wei2"]),
    ("别故意为难别人", "为难", ["wei2", "nan2"]),
    ("相信自己", "相信", ["xiang1", "xin4"]),
    ("去照相馆照相", "照相", ["zhao4", "xiang4"]),
    ("首相发表讲话", "首相", ["shou3", "xiang4"]),
    ("将军在下棋", "将军", ["jiang1", "jun1"]),
    ("打麻将消遣", "麻将", ["ma2", "jiang4"]),
    ("将来的打算", "将来", ["jiang1", "lai2"]),
    ("到处都是人", "到处", ["dao4", "chu4"]),
    ("处理这个问题", "处理", ["chu2", "li3"]),
    ("和同事相处融洽", "相处", ["xiang1", "chu3"]),
    ("依法处罚违章", "处罚", ["chu3", "fa2"]),
    ("房间很大", "房间", ["fang2", "jian1"]),
    ("间接了解情况", "间接", ["jian4", "jie1"]),
    ("站在中间位置", "中间", ["zhong1", "jian1"]),
    ("调查研究民情", "调查", ["diao4", "cha2"]),
    ("及时调整心态", "调整", ["tiao2", "zheng3"]),
    ("空调坏了", "空调", ["kong1", "tiao2"]),
    ("曲调十分优美", "曲调", ["qu3", "diao4"]),
    ("下周出差办事", "出差", ["chu1", "chai1"]),
    ("时间差不多了", "差不多", ["cha4", "bu5", "duo1"]),
    ("两者差别很大", "差别", ["cha1", "bie2"]),
    ("押解犯人上路", "押解", ["ya1", "jie4"]),
    ("保持联系", "联系", ["lian2", "xi4"]),
    ("积累工作经验", "积累", ["ji1", "lei3"]),
    ("劳累过度生病", "劳累", ["lao2", "lei4"]),
    ("节省时间和金钱", "节省", ["jie2", "sheng3"]),
    ("认真反省自己", "反省", ["fan2", "xing3"]),
    ("省会城市很繁华", "省会", ["sheng3", "hui4"]),
    ("下地干活很辛苦", "干活", ["gan4", "huo2"]),
    ("屋子干净整洁", "干净", ["gan1", "jing4"]),
    ("干部下乡开会", "干部", ["gan4", "bu4"]),
    ("饼干很好吃", "饼干", ["bing3", "gan1"]),
    ("收藏古董邮票", "收藏", ["shou1", "cang2"]),
    ("西藏高原风光", "西藏", ["xi1", "zang4"]),
    ("挖到一批宝藏", "宝藏", ["bao3", "zang4"]),
    ("垂死挣扎", "挣扎", ["zheng1", "zha2"]),
    ("包扎伤口", "包扎", ["bao1", "za1"]),
    ("基础很扎实", "扎实", ["zha1", "shi2"]),
    ("吃方便面", "方便", ["fang1", "bian4"]),
    ("顺便买点菜", "顺便", ["shun4", "bian4"]),
    ("薄荷味的糖", "薄荷", ["bo4", "he5"]),
    ("剥削劳动人民", "剥削", ["bo1", "xue1"]),
    ("新鲜空气", "新鲜", ["xin1", "xian1"]),
    ("朝鲜半岛局势", "朝鲜", ["chao2", "xian3"]),
    ("他高兴极了", "高兴", ["gao1", "xing4"]),
    ("兴奋得睡不着", "兴奋", ["xing1", "fen4"]),
    ("生意兴旺发达", "兴旺", ["xing1", "wang4"]),
    ("应该如此", "应该", ["ying1", "gai1"]),
    ("答应了他的请求", "答应", ["da1", "ying5"]),
    ("应用新技术", "应用", ["ying4", "yong4"]),
    ("反应十分迅速", "反应", ["fan3", "ying4"]),
    ("曾经来过这里", "曾经", ["ceng2", "jing1"]),
    ("朝阳缓缓升起", "朝阳", ["zhao1", "yang2"]),
    ("朝代更替频繁", "朝代", ["chao2", "dai4"]),
    ("唐朝诗人李白", "唐朝", ["tang2", "chao2"]),
    ("心脏很健康", "心脏", ["xin1", "zang4"]),
    ("要塞十分坚固", "要塞", ["yao4", "sai4"]),
    ("学生宿舍楼", "宿舍", ["su4", "she4"]),
    ("预订住宿房间", "住宿", ["zhu4", "su4"]),
    ("不小心摔倒在地", "摔倒", ["shuai1", "dao3"]),
    ("给客人倒水", "倒水", ["dao4", "shui3"]),
    ("今天真倒霉", "倒霉", ["dao3", "mei2"]),
    ("放假休息三天", "放假", ["fang4", "jia4"]),
    ("不要说假话", "假话", ["jia3", "hua4"]),
    ("假期结束了", "假期", ["jia4", "qi1"]),
    ("扮演重要角色", "角色", ["jue2", "se4"]),
    ("画一个三角形", "三角", ["san1", "jiao3"]),
    ("他是电影主角", "主角", ["zhu3", "jue2"]),
    ("背包很沉重", "背包", ["bei1", "bao1"]),
    ("背诵课文", "背诵", ["bei4", "song4"]),
    ("试卷发下来了", "试卷", ["shi4", "juan4"]),
    ("卷起袖子干活", "卷起", ["juan2", "qi3"]),
    ("测量土地面积", "测量", ["ce4", "liang2"]),
    ("数量众多", "数量", ["shu4", "liang4"]),
    ("称一下重量", "重量", ["zhong4", "liang4"]),
    ("市场经济活跃", "市场", ["shi4", "chang3"]),
    ("在操场跑步", "操场", ["cao1", "chang3"]),
    ("号召大家参与", "号召", ["hao4", "zhao4"]),
    ("担心他的安全", "担心", ["dan1", "xin1"]),
    ("承担全部责任", "承担", ["cheng2", "dan1"]),
    ("床铺收拾整齐", "床铺", ["chuang2", "pu4"]),
    ("铺路架桥修渠", "铺路", ["pu1", "lu4"]),
    ("店铺早早关门", "店铺", ["dian4", "pu4"]),
    ("墙上有一条缝隙", "缝隙", ["feng4", "xi4"]),
    ("斗争十分激烈", "斗争", ["dou4", "zheng1"]),
    ("北斗七星高挂", "北斗", ["bei2", "dou3"]),
    ("为理想而奋斗", "奋斗", ["fen4", "dou4"]),
    ("收到一封恐吓信", "恐吓", ["kong3", "he4"]),
    ("别吓唬小孩子", "吓唬", ["xia4", "hu5"]),
    ("先喝水再吃饭", "喝水", ["he1", "shui3"]),
    ("观众喝彩叫好", "喝彩", ["he4", "cai3"]),
    ("哄堂大笑起来", "哄堂", ["hong1", "tang2"]),
    ("咽喉肿痛难忍", "咽喉", ["yan1", "hou2"]),
    ("狼吞虎咽地吃", "虎咽", ["hu3", "yan4"]),
    ("症状十分明显", "症状", ["zheng4", "zhuang4"]),
    ("海边捡贝壳", "贝壳", ["bei4", "ke2"]),
    ("地壳运动剧烈", "地壳", ["di4", "qiao4"]),
    ("挑选新鲜水果", "挑选", ["tiao1", "xuan3"]),
    ("勇敢挑战极限", "挑战", ["tiao3", "zhan4"]),
    ("丧失了信心", "丧失", ["sang4", "shi1"]),
    ("办完丧事回家", "丧事", ["sang1", "shi4"]),
    ("向前奔跑", "奔跑", ["ben1", "pao3"]),
    ("投奔远方亲友", "投奔", ["tou2", "ben4"]),
    ("船只停泊在港口", "停泊", ["ting2", "bo2"]),
    ("湖泊星罗棋布", "湖泊", ["hu2", "po1"]),
    ("给爷爷盛饭", "盛饭", ["cheng2", "fan4"]),
    ("盛大的节日", "盛大", ["sheng4", "da4"]),
    ("草木茂盛", "茂盛", ["mao4", "sheng4"]),
    ("禁止吸烟", "禁止", ["jin4", "zhi3"]),
    ("经济发展迅速", "经济", ["jing1", "ji4"]),
    ("救济受灾群众", "救济", ["jiu4", "ji4"]),
    ("宁可不去", "宁可", ["ning4", "ke3"]),
    ("生活安宁祥和", "安宁", ["an1", "ning2"]),
    ("屏幕显示清晰", "屏幕", ["ping2", "mu4"]),
    ("屏住呼吸等待", "屏住", ["bing3", "zhu4"]),
    ("旋转木马转动", "旋转", ["xuan2", "zhuan3"]),
    ("将士凯旋归来", "凯旋", ["kai3", "xuan2"]),
    ("粘贴邮票寄信", "粘贴", ["zhan1", "tie1"]),
    ("粘稠的液体", "粘稠", ["nian2", "chou2"]),
    ("给予大力帮助", "给予", ["ji2", "yu3"]),
    ("把书交给我", "交给", ["jiao1", "gei3"]),
    ("大街小巷都知道", "小巷", ["xiao3", "xiang4"]),
    ("模型飞机上天", "模型", ["mo2", "xing2"]),
    ("模样十分可爱", "模样", ["mu2", "yang5"]),
    ("蒙古大草原", "蒙古", ["meng2", "gu3"]),
    ("启蒙老师难忘", "启蒙", ["qi3", "meng2"]),
    ("倔强的脾气", "倔强", ["jue2", "jiang4"]),
    ("意志坚强", "坚强", ["jian1", "qiang2"]),
    ("勉强同意了", "勉强", ["mian2", "qiang3"]),
    ("都市生活节奏快", "都市", ["du1", "shi4"]),
    ("首都机场很大", "首都", ["shou3", "du1"]),
    ("我们都来了", "都", ["dou1"]),
    ("和平年代珍贵", "和平", ["he2", "ping2"]),
    ("不要随声附和", "附和", ["fu4", "he4"]),
    ("落后就要挨打", "落后", ["luo4", "hou4"]),
    ("做事丢三落四", "落四", ["la4", "si4"]),
    ("水平参差不齐", "参差", ["cen1", "ci1"]),
    ("这个银行的行长很严格", "银行", ["yin2", "hang2"]),
    ("这个银行的行长很严格", "行长", ["hang2", "zhang3"]),
    ("他在重庆工作", "重庆", ["chong2", "qing4"]),
    ("这件事很重要", "重要", ["zhong4", "yao4"]),
    ("他要还钱给我", "还钱", ["huan2", "qian2"]),
    ("我还有问题", "还有", ["hai2", "you3"]),
    ("偿还债务", "偿还", ["chang2", "huan2"]),
    ("行业规范", "行业", ["hang2", "ye4"]),
    ("外行看热闹", "外行", ["wai4", "hang2"]),
    ("内行看门道", "内行", ["nei4", "hang2"]),
    ("市长讲话", "市长", ["shi4", "zhang3"]),
    ("部长开会", "部长", ["bu4", "zhang3"]),
    ("孩子长大了", "长大", ["zhang3", "da4"]),
    ("经济增长", "增长", ["zeng1", "zhang3"]),
    ("万里长城", "长城", ["chang2", "cheng2"]),
    ("董事长发言", "董事长", ["dong3", "shi4", "zhang3"]),
    ("重新开始", "重新", ["chong2", "xin1"]),
    ("重复练习", "重复", ["chong2", "fu4"]),
    ("历史重现", "重现", ["chong2", "xian4"]),
    ("旧地重逢", "重逢", ["chong2", "feng2"]),
    ("听音乐", "音乐", ["yin1", "yue4"]),
    ("生日快乐", "快乐", ["kuai4", "le4"]),
    ("他会弹琴", "弹琴", ["tan2", "qin2"]),
    ("子弹上膛", "子弹", ["zi3", "dan4"]),
    ("导弹发射", "导弹", ["dao3", "dan4"]),
    ("炸弹爆炸", "爆炸", ["bao4", "zha4"]),
    ("油炸食品", "油炸", ["you2", "zha2"]),
    ("乐器演奏", "乐器", ["yue4", "qi4"]),
    ("流行歌曲", "歌曲", ["ge1", "qu3"]),
    ("作曲家", "作曲", ["zuo4", "qu3"]),
    ("睡觉时间", "睡觉", ["shui4", "jiao4"]),
    ("我觉得可以", "觉得", ["jue2", "de5"]),
    ("获得冠军", "获得", ["huo4", "de5"]),
    ("获得冠军", "冠军", ["guan4", "jun1"]),
    ("值得表扬", "值得", ["zhi2", "de5"]),
    ("我记得他", "记得", ["ji4", "de5"]),
    ("成绩显得突出", "显得", ["xian3", "de5"]),
    ("教书育人", "教书", ["jiao1", "shu1"]),
    ("教学相长", "教学", ["jiao4", "xue2"]),
    ("地方特色", "地方", ["di4", "fang5"]),
    ("种地为生", "种地", ["zhong4", "di5"]),
    ("种子发芽", "种子", ["zhong3", "zi5"]),
    ("民间传说", "传说", ["chuan2", "shuo1"]),
    ("名人传记", "传记", ["zhuan4", "ji4"]),
    ("他写了自传", "自传", ["zi4", "zhuan4"]),
    ("数学竞赛", "数学", ["shu4", "xue2"]),
    ("出差在外", "出差", ["chu1", "chai1"]),
    ("差别很大", "差别", ["cha1", "bie2"]),
    ("误差极小", "误差", ["wu4", "cha1"]),
    ("相信自己", "相信", ["xiang1", "xin4"]),
    ("拍了相片", "相片", ["xiang4", "pian4"]),
    ("调查研究", "调查", ["diao4", "cha2"]),
    ("调整结构", "调整", ["tiao2", "zheng3"]),
    ("会计报表", "会计", ["kuai4", "ji4"]),
    ("价格便宜", "便宜", ["pian2", "yi5"]),
    ("交通方便", "方便", ["fang1", "bian4"]),
    ("别着急", "着急", ["zhao2", "ji2"]),
    ("沉着应对", "沉着", ["chen2", "zhuo2"]),
    ("执着追求", "执着", ["zhi2", "zhuo2"]),
    ("着手准备", "着手", ["zhuo2", "shou3"]),
    ("空气清新", "空气", ["kong1", "qi4"]),
    ("今天有空", "有空", ["you3", "kong4"]),
    ("假期结束", "假期", ["jia4", "qi1"]),
    ("放假回家", "放假", ["fang4", "jia4"]),
    ("请假条", "请假", ["qing3", "jia4"]),
    ("间隔时间", "间隔", ["jian4", "ge2"]),
    ("间接证据", "间接", ["jian4", "jie1"]),
    ("一切顺利", "一切", ["yi2", "qie4"]),
    ("关系密切", "密切", ["mi4", "qie4"]),
    ("态度亲切", "亲切", ["qin1", "qie4"]),
    ("东北人参", "人参", ["ren2", "shen1"]),
    ("参差不齐", "参差", ["cen1", "ci1"]),
    ("图形对称", "对称", ["dui4", "chen4"]),
    ("工作称职", "称职", ["chen4", "zhi2"]),
    ("自我反省", "反省", ["fan2", "xing3"]),  # 3-3 sandhi
    ("模样可爱", "模样", ["mu2", "yang5"]),
    ("湖泊众多", "湖泊", ["hu2", "po1"]),
    ("基础薄弱", "薄弱", ["bo2", "ruo4"]),
    ("薄荷糖", "薄荷", ["bo4", "he5"]),
    ("剥削阶级", "剥削", ["bo1", "xue1"]),
    ("削弱力量", "削弱", ["xue1", "ruo4"]),
    ("道路堵塞", "堵塞", ["du3", "se4"]),
    ("宁可不去", "宁可", ["ning4", "ke3"]),
    ("勉强同意", "勉强", ["mian2", "qiang3"]),  # 3-3 sandhi
    ("性格倔强", "倔强", ["jue2", "jiang4"]),
    ("几乎完成", "几乎", ["ji1", "hu1"]),
    ("公开露面", "露面", ["lou4", "mian4"]),
    ("秘密泄露", "泄露", ["xie4", "lou4"]),
    ("果实结实", "结实", ["jie1", "shi5"]),
    ("缴械投降", "投降", ["tou2", "xiang2"]),
    ("鼓掌喝彩", "喝彩", ["he4", "cai3"]),
    ("湖上划船", "划船", ["hua2", "chuan2"]),
    ("扮演角色", "角色", ["jue2", "se4"]),
    ("电影主角", "主角", ["zhu3", "jue2"]),
    ("原文校对", "校对", ["jiao4", "dui4"]),
    ("尽管如此", "尽管", ["jin2", "guan3"]),  # 3-3 sandhi
    ("尽量配合", "尽量", ["jin3", "liang4"]),
    ("看守大门", "看守", ["kan1", "shou3"]),
    ("地壳运动", "地壳", ["di4", "qiao4"]),
    ("积累经验", "积累", ["ji1", "lei3"]),
    ("测量温度", "测量", ["ce4", "liang2"]),
    ("商量对策", "商量", ["shang1", "liang5"]),
    ("云雾笼罩", "笼罩", ["long3", "zhao4"]),
    ("互相埋怨", "埋怨", ["man2", "yuan4"]),
    ("内蒙古", "蒙古", ["meng3", "gu3"]),
    ("遭遇灾难", "灾难", ["zai1", "nan4"]),
    ("安置难民", "难民", ["nan4", "min2"]),
    ("临街店铺", "店铺", ["dian4", "pu4"]),
    ("照片曝光", "曝光", ["bao4", "guang1"]),
    ("操办丧事", "丧事", ["sang1", "shi4"]),
    ("学生宿舍", "宿舍", ["su4", "she4"]),
    ("仿佛见过似的", "似的", ["shi4", "de5"]),
    ("发请帖", "请帖", ["qing2", "tie3"]),  # 3-3 sandhi
    ("临摹字帖", "字帖", ["zi4", "tie4"]),
    ("开拓市场", "开拓", ["kai1", "tuo4"]),
    ("当作礼物", "当作", ["dang4", "zuo4"]),
    ("系统更新", "更新", ["geng1", "xin1"]),
    ("墙上裂缝", "裂缝", ["lie4", "feng4"]),
    ("英勇战斗", "战斗", ["zhan4", "dou4"]),
    ("艰苦奋斗", "奋斗", ["fen4", "dou4"]),
    ("无比兴奋", "兴奋", ["xing1", "fen4"]),
    ("理发店", "理发", ["li3", "fa4"]),
    ("头发乌黑", "头发", ["tou2", "fa5"]),  # must-neutral word
    ("衣服漂亮", "漂亮", ["piao4", "liang5"]),
    ("工作效率", "效率", ["xiao4", "lv4"]),
    ("降水概率", "概率", ["gai4", "lv4"]),
    ("存款利率", "利率", ["li4", "lv4"]),
    ("天气暖和", "暖和", ["nuan3", "huo5"]),
    ("少年宫", "少年", ["shao4", "nian2"]),
    ("处罚决定", "处罚", ["chu3", "fa2"]),
    ("处境艰难", "处境", ["chu3", "jing4"]),
    ("干部考核", "干部", ["gan4", "bu4"]),
    ("聪明能干", "能干", ["neng2", "gan4"]),
    # ---- round 5: phrase-layer additions (assets/zh_phrases.tsv) ----
    # neutral-tone suffixes
    ("桌子上放着书", "桌子", ["zhuo1", "zi5"]),
    ("石头很重", "石头", ["shi2", "tou5"]),
    ("我的耳朵疼", "耳朵", ["er3", "duo5"]),
    ("葡萄很甜", "葡萄", ["pu2", "tao5"]),
    ("豆腐便宜", "豆腐", ["dou4", "fu5"]),
    ("衣裳很干净", "衣裳", ["yi1", "shang5"]),
    ("拿好钥匙", "钥匙", ["yao4", "shi5"]),
    ("他很客气", "客气", ["ke4", "qi5"]),
    ("别着急", "着急", ["zhao2", "ji2"]),
    ("脑袋很大", "脑袋", ["nao3", "dai5"]),
    ("胳膊受伤了", "胳膊", ["ge1", "bo5"]),
    ("狐狸很狡猾", "狐狸", ["hu2", "li5"]),
    ("骆驼在沙漠里", "骆驼", ["luo4", "tuo5"]),
    ("吃个萝卜", "萝卜", ["luo2", "bo5"]),
    # surnames / place names with special readings
    ("重庆火锅很辣", "重庆", ["chong2", "qing4"]),
    ("厦门靠海", "厦门", ["xia4", "men2"]),
    ("他住在西藏", "西藏", ["xi1", "zang4"]),
    ("成都是大都市", "成都", ["cheng2", "du1"]),
    ("单于南下", "单于", ["chan2", "yu2"]),
    ("六安产茶", "六安", ["lu4", "an1"]),
    ("蚌埠通火车", "蚌埠", ["beng4", "bu4"]),
    ("番禺在广州", "番禺", ["pan1", "yu2"]),
    ("燕京啤酒", "燕京", ["yan1", "jing1"]),
    # polyphones in context
    ("他会弹钢琴", "弹钢琴", ["tan2", "gang1", "qin2"]),
    ("捡到一枚弹壳", "弹壳", ["dan4", "ke2"]),
    ("地壳运动", "地壳", ["di4", "qiao4"]),
    ("这首曲子好听", "曲子", ["qu3", "zi5"]),
    ("道路弯曲", "弯曲", ["wan1", "qu1"]),
    ("不要折腾", "折腾", ["zhe1", "teng5"]),
    ("商场打折", "打折", ["da3", "zhe2"]),
    ("汽车旋转起来", "旋转", ["xuan2", "zhuan3"]),
    ("坐车会晕车", "晕车", ["yun4", "che1"]),
    ("验血查血压", "血压", ["xue4", "ya1"]),
    ("住宿一晚", "住宿", ["zhu4", "su4"]),
    ("提高效率", "效率", ["xiao4", "lv4"]),
    ("率领队伍", "率领", ["shuai4", "ling3"]),
    ("自我反省", "反省", ["fan2", "xing3"]),
    ("心脏健康", "心脏", ["xin1", "zang4"]),
    ("说脏话不好", "脏话", ["zang1", "hua4"]),
    ("基础扎实", "扎实", ["zha1", "shi2"]),
    ("苦苦挣扎", "挣扎", ["zheng1", "zha2"]),
    ("历史记载", "记载", ["ji4", "zai3"]),
    ("关卡很严", "关卡", ["guan1", "qia3"]),
    ("这个模样", "模样", ["mu2", "yang5"]),
    ("制作模型", "模型", ["mo2", "xing2"]),
    ("正月十五", "正月", ["zheng1", "yue4"]),
    ("落枕了很疼", "落枕", ["lao4", "zhen3"]),
    ("扮演角色", "角色", ["jue2", "se4"]),
    ("猪圈很臭", "猪圈", ["zhu1", "juan4"]),
    ("水分充足", "水分", ["shui3", "fen4"]),
    ("埋怨别人", "埋怨", ["man2", "yuan4"]),
    ("屋里闷热", "闷热", ["men1", "re4"]),
    ("内蒙古草原", "蒙古", ["meng3", "gu3"]),
    ("恶心想吐", "恶心", ["e3", "xin1"]),
    ("令人厌恶", "厌恶", ["yan4", "wu4"]),
    ("身分证明", "身分", ["shen1", "fen4"]),
    ("墙上有裂缝", "裂缝", ["lie4", "feng4"]),
    ("缝补衣服", "缝补", ["feng2", "bu3"]),
    ("将领出征", "将领", ["jiang4", "ling3"]),
    ("情不自禁", "情不自禁", ["qing2", "bu2", "zi4", "jin1"]),
    ("尽量早到", "尽量", ["jin3", "liang4"]),
    ("走到尽头", "尽头", ["jin4", "tou2"]),
    ("一块空地", "空地", ["kong4", "di5"]),
    ("工作劳累", "劳累", ["lao2", "lei4"]),
    ("积累经验", "积累", ["ji1", "lei3"]),
    ("测量体温", "测量", ["ce4", "liang2"]),
    ("产品质量", "质量", ["zhi4", "liang4"]),
    ("鸟笼挂着", "鸟笼", ["niao3", "long2"]),
    ("笼罩大地", "笼罩", ["long3", "zhao4"]),
    ("遇难同胞", "遇难", ["yu4", "nan4"]),
    ("店铺开门", "店铺", ["dian4", "pu4"]),
    ("铺路修桥", "铺路", ["pu1", "lu4"]),
    ("奇数偶数", "奇数", ["ji1", "shu4"]),
    ("悄然离开", "悄然", ["qiao3", "ran2"]),
    ("关系密切", "密切", ["mi4", "qie4"]),
    ("出去散步", "散步", ["san4", "bu4"]),
    ("写散文", "散文", ["san3", "wen2"]),
    ("舍不得离开", "舍不得", ["she3", "bu5", "de5"]),
    ("饭菜煮熟了", "煮熟", ["zhu3", "shou2"]),
    ("交通堵塞", "堵塞", ["du3", "se4"]),
    ("塞子塞紧", "塞子", ["sai1", "zi5"]),
    ("垂头丧气", "丧气", ["sang4", "qi5"]),
    ("提供帮助", "提供", ["ti2", "gong1"]),
    ("供品摆好", "供品", ["gong4", "pin3"]),
    ("称呼长辈", "称呼", ["cheng1", "hu5"]),
    ("称心如意", "称心", ["chen4", "xin1"]),
    ("投降敌人", "投降", ["tou2", "xiang2"]),
    ("飞机降落", "降落", ["jiang4", "luo4"]),
    ("朝阳升起", "朝阳", ["zhao1", "yang2"]),
    ("唐朝诗人", "唐朝", ["tang2", "chao2"]),
    ("屡见不鲜", "屡见不鲜", ["lv3", "jian4", "bu4", "xian1"]),
    ("参差不齐", "参差", ["cen1", "ci1"]),
    ("人参很贵", "人参", ["ren2", "shen1"]),
    ("大腹便便", "便便", ["pian2", "pian2"]),
    ("自给自足", "自给自足", ["zi4", "ji3", "zi4", "zu2"]),
    ("供给不足", "供给", ["gong1", "ji3"]),
    ("泄露秘密", "泄露", ["xie4", "lou4"]),
    ("露天电影", "露天", ["lu4", "tian1"]),
    ("鸭绿江边", "鸭绿江", ["ya1", "lu4", "jiang1"]),
    ("湖泊很多", "湖泊", ["hu2", "po1"]),
    ("船只停泊", "停泊", ["ting2", "bo2"]),
    ("漂亮衣服", "漂亮", ["piao4", "liang5"]),
    ("河水漂流", "漂流", ["piao1", "liu2"]),
    ("挑水浇地", "挑水", ["tiao1", "shui3"]),
    ("挑战自我", "挑战", ["tiao3", "zhan4"]),
    ("乌龟爬行", "乌龟", ["wu1", "gui1"]),
    ("田地龟裂", "龟裂", ["jun1", "lie4"]),
    ("山脉绵延", "山脉", ["shan1", "mai4"]),
    ("温情脉脉", "脉脉", ["mo4", "mo4"]),
    ("睡个午觉", "午觉", ["wu3", "jiao4"]),
    ("自觉遵守", "自觉", ["zi4", "jue2"]),
    ("撒谎不对", "撒谎", ["sa1", "huang3"]),
    ("撒种插秧", "撒种", ["sa2", "zhong3"]),
    ("传记文学", "传记", ["zhuan4", "ji4"]),
    ("宣传政策", "宣传", ["xuan1", "chuan2"]),
    ("播种小麦的播种机", "播种机", ["bo1", "zhong4", "ji1"]),
    ("兴高采烈", "兴高采烈", ["xing4", "gao1", "cai3", "lie4"]),
    ("兴旺发达", "兴旺", ["xing1", "wang4"]),
    ("恐吓别人", "恐吓", ["kong3", "he4"]),
    ("吓唬小孩", "吓唬", ["xia4", "hu5"]),
    ("负荷过重", "负荷", ["fu4", "he4"]),
    ("荷花盛开", "荷花", ["he2", "hua1"]),
    ("经济发展", "经济", ["jing1", "ji4"]),
    ("人才济济", "济济", ["ji3", "ji5"]),
    ("首相访问", "首相", ["shou3", "xiang4"]),
    ("互相帮助", "互相", ["hu4", "xiang1"]),
    ("参与讨论", "参与", ["can1", "yu4"]),
    ("咬文嚼字", "咬文嚼字", ["yao3", "wen2", "jiao2", "zi4"]),
    ("细嚼慢咽", "细嚼慢咽", ["xi4", "jiao2", "man4", "yan4"]),
    ("咽喉肿痛", "咽喉", ["yan1", "hou2"]),
    ("一唱一和", "一唱一和", ["yi2", "chang4", "yi2", "he4"]),
    ("随声附和", "附和", ["fu4", "he4"]),
    ("天气暖和", "暖和", ["nuan3", "huo5"]),
    ("薄荷味道", "薄荷", ["bo4", "he5"]),
    ("力量单薄", "单薄", ["dan1", "bo2"]),
    ("薄饼好吃", "薄饼", ["bao2", "bing3"]),
    ("背包上学", "背包", ["bei1", "bao1"]),
    ("背诵课文", "背诵", ["bei4", "song4"]),
]


def _word_syllables(sentence, word):
    """Run the full ZH frontend, slice out `word`'s (phones, tones)."""
    norm, phones, tones, word2ph = clean_text(sentence, "ZH")
    assert word in norm, f"{word!r} not in normalized {norm!r}"
    i = norm.index(word)
    start = sum(word2ph[: 1 + i])
    out = []
    for j in range(len(word)):
        n = word2ph[1 + i + j]
        out.append((phones[start:start + n], tones[start:start + n]))
        start += n
    return out


@pytest.mark.parametrize(
    "sentence,word,expected",
    POLYPHONE_CORPUS,
    ids=[w for _, w, _ in POLYPHONE_CORPUS],
)
def test_polyphone_corpus(sentence, word, expected):
    got = _word_syllables(sentence, word)
    assert len(got) == len(expected)
    for (phones, tones), syl in zip(got, expected):
        ini, fin = mandarin.split_pinyin(syl[:-1])
        want_ph, want_tone = mandarin.syllable_to_phones(ini, fin + syl[-1])
        assert phones == want_ph, (
            f"{word}: phones {phones} != {want_ph} (want {syl})")
        assert all(t == want_tone for t in tones), (
            f"{word}: tones {tones} != {want_tone} (want {syl})")


class TestFullTable:
    def test_size_and_sanity(self):
        table = ext_pinyin()
        assert len(table) > 20000
        # spot facts across the frequency spectrum
        assert table["鹃"] == "juan1"
        assert table["庐"] == "lu2"
        assert table["邴"] == "bing3"
        assert table["壑"] == "he4"
        assert table["氢"] == "qing1"

    def test_hand_lexicon_overrides_table(self):
        # 干 collates in the gan4 class; the hand default gan1 must win
        from bert_vits2_tpu.text.mandarin_lexicon import word_to_pinyin

        assert CHAR_PINYIN["干"] == "gan1"
        assert word_to_pinyin("干")[0] == "gan1"

    def test_frequency_coverage(self):
        """>=99.9% of running text by character frequency (jieba dict as
        the frequency corpus) resolves to a reading."""
        import jieba

        freq: dict[str, int] = {}
        d = os.path.join(os.path.dirname(jieba.__file__), "dict.txt")
        with open(d, encoding="utf-8") as f:
            for line in f:
                w, n, _ = line.split()
                for c in w:
                    if "一" <= c <= "龥":
                        freq[c] = freq.get(c, 0) + int(n)
        table = ext_pinyin()
        total = sum(freq.values())
        covered = sum(n for c, n in freq.items()
                      if c in CHAR_PINYIN or c in table)
        assert covered / total > 0.999, covered / total

    def test_all_readings_convert_to_phones(self):
        from bert_vits2_tpu.text.symbols import SYMBOLS

        for r in set(ext_pinyin().values()):
            ini, fin = mandarin.split_pinyin(r[:-1])
            phones, tone = mandarin.syllable_to_phones(ini, fin + r[-1])
            assert 1 <= tone <= 5
            for p in phones:
                assert p in SYMBOLS, (r, p)

    def test_rare_char_sentence_no_unk(self):
        # every hanzi here is OUTSIDE the hand lexicon (layer-3 only)
        _, phones, _, _ = clean_text("鹦鹉栖息在庐山的峭壁", "ZH")
        assert "UNK" not in phones


class TestTableProvenance:
    def test_builder_reproduces_shipped_asset(self):
        """tools/build_zh_pinyin_table.py rebuilt from the CLDR collation
        data in /usr/share/perl + the curated fills must reproduce the
        committed asset exactly (provenance: the table is derived data,
        not opaque)."""
        import os
        import sys

        cjk = "/usr/share/perl/5.36.0/Unicode/Collate/CJK/Pinyin.pm"
        if not os.path.exists(cjk):
            pytest.skip("CLDR collation data not in this image")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "tools"))
        try:
            from build_zh_pinyin_table import main as build_main
        finally:
            sys.path.pop(0)
        resolved, violations = build_main(write=False)
        assert violations == []
        rebuilt = {}
        for _, reading, chars, _, _ in resolved:
            if reading is None:
                continue
            for ch in chars:
                rebuilt.setdefault(ch, reading)
        assert rebuilt == ext_pinyin()
